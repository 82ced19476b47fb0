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


# ---------------------------------------------------------------------------
# Lightning hyper_parameters parsing (omegaconf-free)
# ---------------------------------------------------------------------------

def _omegaconf_like_wrapper(monkeypatch):
    """Classes that pickle under omegaconf's real module paths with its real
    state layout (DictConfig/ListConfig `_content`, ValueNode `_val`), then
    vanish from sys.modules before load — exactly what reading a genuine
    hydra-composed Lightning checkpoint in this omegaconf-free image looks
    like."""
    import sys
    import types as _types

    class DictConfig:  # noqa: D401
        pass

    class ListConfig:
        pass

    class AnyNode:
        pass

    DictConfig.__module__, DictConfig.__qualname__ = "omegaconf.dictconfig", "DictConfig"
    ListConfig.__module__, ListConfig.__qualname__ = "omegaconf.listconfig", "ListConfig"
    AnyNode.__module__, AnyNode.__qualname__ = "omegaconf.nodes", "AnyNode"
    mods = {
        "omegaconf.dictconfig": ("DictConfig", DictConfig),
        "omegaconf.listconfig": ("ListConfig", ListConfig),
        "omegaconf.nodes": ("AnyNode", AnyNode),
    }
    created = []
    if "omegaconf" not in sys.modules:
        monkeypatch.setitem(sys.modules, "omegaconf", _types.ModuleType("omegaconf"))
    for name, (attr, cls) in mods.items():
        mod = _types.ModuleType(name)
        setattr(mod, attr, cls)
        monkeypatch.setitem(sys.modules, name, mod)
        created.append(name)

    def wrap(v):
        if isinstance(v, dict):
            o = DictConfig.__new__(DictConfig)
            o.__dict__ = {"_metadata": None, "_parent": None,
                          "_content": {k: wrap(x) for k, x in v.items()}}
            return o
        if isinstance(v, (list, tuple)):
            o = ListConfig.__new__(ListConfig)
            o.__dict__ = {"_metadata": None, "_parent": None, "_content": [wrap(x) for x in v]}
            return o
        o = AnyNode.__new__(AnyNode)
        o.__dict__ = {"_parent": None, "_val": "???" if v is None else v}
        return o

    def forget():
        import sys as _s

        for name in created + ["omegaconf"]:
            _s.modules.pop(name, None)

    return wrap, forget


def test_hparams_from_omegaconf_pickle_beats_shape_guesses(tmp_path, monkeypatch):
    """A 4-head encoder with a 4×4 decoder head split is invisible to shape
    inference (to_q has 16 rows — the %64 heuristic reads that as one 16-dim
    head, and encoder heads don't show in shapes at all).  The checkpoint's
    own hyper_parameters, pickled as omegaconf objects, must win."""
    import dataclasses

    from emojivoice_tpu.config import DecoderConfig, EncoderConfig
    from emojivoice_tpu.io.torch_ckpt import export_matcha_hparams, load_matcha_params

    cfg = tiny_cfg()
    # n_channels 24 (+8 spk concat = 32) keeps the per-head/RoPE split even at 4 heads
    cfg = dataclasses.replace(
        cfg,
        encoder=dataclasses.replace(cfg.encoder, n_heads=4, n_channels=24),
        decoder=dataclasses.replace(cfg.decoder, attention_head_dim=4, num_heads=4),
    )
    _, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    sd.pop("mel_mean")
    sd.pop("mel_std")

    wrap, forget = _omegaconf_like_wrapper(monkeypatch)
    path = tmp_path / "fourhead.ckpt"
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
         "hyper_parameters": wrap(export_matcha_hparams(cfg))},
        path,
    )
    forget()  # omegaconf absent at read time, like the runtime image

    _, loaded_cfg = load_matcha_params(str(path))
    assert loaded_cfg.encoder.n_heads == 4
    assert loaded_cfg.decoder.attention_head_dim == 4
    assert loaded_cfg.decoder.num_heads == 4
    assert loaded_cfg.data_statistics.mel_mean == cfg.data_statistics.mel_mean
    # and the converted params round-trip numerically
    params2, _ = load_matcha_params(str(path))
    for a, b in zip(jax.tree.leaves(jax.device_get(params)), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), b, atol=1e-6)


def test_hparams_shape_mismatch_raises():
    cfg = tiny_cfg()
    _, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    bad = {"decoder": {"num_heads": 3, "attention_head_dim": 4}}  # 12 ≠ to_q rows
    import pytest

    with pytest.raises(ValueError, match="heads"):
        infer_model_config_from_state_dict(sd, hparams=bad)


def test_hparams_plain_dict_and_missing():
    from emojivoice_tpu.io.torch_ckpt import extract_hyper_parameters

    # exported-by-us checkpoints carry plain dicts
    hp = extract_hyper_parameters({"hyper_parameters": {"n_feats": 80, "out_size": None}})
    assert hp == {"n_feats": 80, "out_size": None}
    # raw state-dict dumps have none
    assert extract_hyper_parameters({"state_dict": {}}) is None
    assert extract_hyper_parameters("not a dict") is None


def test_export_torch_embeds_readable_hparams(tmp_path):
    """io.export_torch writes hyper_parameters that load_matcha_params reads
    back — an exported checkpoint documents its own architecture."""
    from emojivoice_tpu.io.torch_ckpt import export_matcha_hparams, extract_hyper_parameters

    cfg = tiny_cfg()
    _, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    path = tmp_path / "with_hparams.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()},
                "hyper_parameters": export_matcha_hparams(cfg)}, path)
    hp = extract_hyper_parameters(load_torch_file(str(path)))
    assert hp["encoder"]["encoder_params"]["n_heads"] == cfg.encoder.n_heads
    assert hp["decoder"]["num_heads"] == cfg.decoder.num_heads
    assert hp["cfm"]["sigma_min"] == cfg.cfm.sigma_min


def test_hparams_partial_head_split_and_zero_dropout():
    """Review regressions: (a) hparams carrying only num_heads derive
    head_dim from the to_q rows instead of rejecting against the 64
    default; (b) a legitimate 0.0 dropout stored in the checkpoint is not
    silently replaced by the default (falsy-`or` bug)."""
    cfg = tiny_cfg()  # decoder: head_dim 8 × 2 heads → to_q rows 16
    _, params = _init_tiny(cfg)
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    hp = {"decoder": {"num_heads": 2, "dropout": 0.0},
          "encoder": {"encoder_params": {"p_dropout": 0.0}},
          "cfm": {"sigma_min": 0.0}}
    inferred = infer_model_config_from_state_dict(sd, hparams=hp)
    assert inferred.decoder.num_heads == 2
    assert inferred.decoder.attention_head_dim == 8  # derived, not defaulted
    assert inferred.decoder.dropout == 0.0
    assert inferred.encoder.p_dropout == 0.0
    assert inferred.cfm.sigma_min == 0.0
