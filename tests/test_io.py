"""Checkpoint I/O: torch-free pickle reader, converters, orbax round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from emojivoice_tpu.io.checkpoint import CheckpointManager
from emojivoice_tpu.io.torch_ckpt import (
    convert_matcha_state_dict,
    export_matcha_state_dict,
    fold_weight_norm_torch,
    infer_model_config_from_state_dict,
    load_torch_state_dict,
)
from emojivoice_tpu.io.torch_pickle import load_torch_file
from emojivoice_tpu.models import MatchaTTS

from tests.test_models import tiny_cfg


def _init_tiny(cfg):
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8), jnp.int32)
    y = jnp.zeros((1, 16, cfg.n_feats))
    params = model.init({"params": rng, "dropout": rng}, x, jnp.array([8]), y, jnp.array([16]),
                        jnp.array([0]) if cfg.n_spks > 1 else None, rng=rng)
    return model, params


def test_torch_pickle_reader(tmp_path, rng):
    obj = {
        "state_dict": {
            "a.weight": torch.from_numpy(rng.normal(size=(3, 4)).astype(np.float32)),
            "b.bias": torch.arange(5, dtype=torch.float32),
        },
        "epoch": 7,
    }
    path = tmp_path / "ckpt.pt"
    torch.save(obj, path)
    loaded = load_torch_file(str(path))
    assert loaded["epoch"] == 7
    np.testing.assert_allclose(loaded["state_dict"]["a.weight"], obj["state_dict"]["a.weight"].numpy())
    np.testing.assert_allclose(loaded["state_dict"]["b.bias"], np.arange(5, dtype=np.float32))


def test_torch_pickle_noncontiguous_and_dtypes(tmp_path):
    t = torch.arange(24, dtype=torch.float32).reshape(4, 6).t()  # non-contiguous
    obj = {"x": t, "i": torch.arange(4, dtype=torch.int64), "h": torch.ones(3, dtype=torch.float16)}
    path = tmp_path / "t.pt"
    torch.save(obj, path)
    loaded = load_torch_file(str(path))
    np.testing.assert_allclose(loaded["x"], t.numpy())
    assert loaded["i"].dtype == np.int64
    assert loaded["h"].dtype == np.float16


def test_matcha_converter_roundtrip(tmp_path):
    """export(ours) → torch.save → torch-free load → convert == original tree."""
    cfg = tiny_cfg()
    model, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)

    path = tmp_path / "matcha.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}}, path)

    sd2 = load_torch_state_dict(str(path))
    params2 = convert_matcha_state_dict(sd2, cfg)

    # identical structure
    s1 = jax.tree_util.tree_structure(jax.device_get(params))
    s2 = jax.tree_util.tree_structure(params2)
    assert s1 == s2, f"{s1}\n!=\n{s2}"
    # identical values
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)

    # model runs with converted params
    out = model.apply(params2, jnp.arange(1, 9, dtype=jnp.int32)[None], jnp.array([8]), 32, 2, 0.667,
                      jnp.array([1]), 1.0, jax.random.PRNGKey(0), method=MatchaTTS.synthesise)
    assert out["mel"].shape == (1, 32, cfg.n_feats)


def test_infer_config_from_state_dict():
    cfg = tiny_cfg()
    _, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    inferred = infer_model_config_from_state_dict(sd)
    assert inferred.n_vocab == cfg.n_vocab
    assert inferred.n_spks == cfg.n_spks
    assert inferred.spk_emb_dim == cfg.spk_emb_dim
    assert inferred.n_feats == cfg.n_feats
    assert inferred.encoder.n_channels == cfg.encoder.n_channels
    assert inferred.encoder.n_layers == cfg.encoder.n_layers
    assert tuple(inferred.decoder.channels) == tuple(cfg.decoder.channels)
    assert inferred.decoder.num_mid_blocks == cfg.decoder.num_mid_blocks
    assert inferred.data_statistics.mel_mean == cfg.data_statistics.mel_mean


def test_fold_weight_norm_torch(rng):
    cout, cin, k = 6, 4, 3
    conv = torch.nn.Conv1d(cin, cout, k)
    conv = torch.nn.utils.weight_norm(conv)
    g = conv.weight_g.detach().numpy().copy()
    v = conv.weight_v.detach().numpy().copy()
    torch.nn.utils.remove_weight_norm(conv)
    np.testing.assert_allclose(fold_weight_norm_torch(g, v), conv.weight.detach().numpy(),
                               atol=1e-6)


def test_orbax_roundtrip(tmp_path):
    from emojivoice_tpu.config import ljspeech

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(5)}
    mgr = CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2)
    mgr.save(5, jax.device_get(state), cfg=ljspeech())
    assert mgr.latest_step() == 5
    restored = mgr.restore(template=jax.device_get(state))
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))
    cfg = mgr.load_config()
    assert cfg.data.name == "ljspeech"
    mgr.close()
