"""Train → save (orbax) → serve round trip, through the CLI path."""

import dataclasses

import jax
import numpy as np

from emojivoice_tpu import config as cfglib
from emojivoice_tpu.config import OptimizerConfig
from emojivoice_tpu.inference.pipeline import SynthesisPipeline
from emojivoice_tpu.io.checkpoint import CheckpointManager
from emojivoice_tpu.training import create_train_state

from tests.test_pipeline import tiny_root


def test_serve_from_orbax(tmp_path):
    root = tiny_root()
    state = create_train_state(root.model, OptimizerConfig(), seed=3)
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(7, jax.device_get({"params": state.params, "opt_state": state.opt_state,
                                "step": state.step}), cfg=root, force=True)
    mgr.close()

    pipe = SynthesisPipeline.from_orbax(str(tmp_path / "ckpts"),
                                        cleaners=("basic_cleaners",),
                                        mel_buckets=(64, 128), text_buckets=(64,))
    assert pipe.model_cfg.n_spks == root.model.n_spks
    res = pipe.synthesise(["served from orbax"], spks=[1], n_timesteps=2, seed=0)[0]
    assert res.mel_length > 0
    # no vocoder checkpoint was given → mel-only result
    assert res.wav.size == 0

    # parity with a direct pipeline over the same params
    direct = SynthesisPipeline(root.model, state.params, cleaners=("basic_cleaners",),
                               mel_buckets=(64, 128), text_buckets=(64,))
    res2 = direct.synthesise(["served from orbax"], spks=[1], n_timesteps=2, seed=0)[0]
    np.testing.assert_allclose(res.mel, res2.mel, atol=1e-6)
