"""Train-here → export-to-torch → reload-here round trip."""

import jax
import numpy as np
import torch

from emojivoice_tpu.config import OptimizerConfig, get_preset
from emojivoice_tpu.io.checkpoint import CheckpointManager
from emojivoice_tpu.io.export_torch import export
from emojivoice_tpu.io.torch_ckpt import load_matcha_params
from emojivoice_tpu.training import create_train_state


def test_export_torch_roundtrip(tmp_path):
    root = get_preset("tiny")
    state = create_train_state(root.model, OptimizerConfig(), seed=11)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(3, jax.device_get({"params": state.params, "opt_state": state.opt_state,
                                "step": state.step}), cfg=root, force=True)
    mgr.close()

    out = export(str(tmp_path / "ckpts"), str(tmp_path / "exported.ckpt"))
    assert out.exists()
    # loads as a torch checkpoint via our own reference-format loader
    params2, cfg2 = load_matcha_params(str(out))
    assert cfg2.n_spks == root.model.n_spks
    a = jax.tree.leaves(jax.device_get(state.params))
    b = jax.tree.leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
    # and as a plain torch file
    obj = torch.load(out, map_location="cpu", weights_only=True)
    assert "state_dict" in obj and "encoder.emb.weight" in obj["state_dict"]
