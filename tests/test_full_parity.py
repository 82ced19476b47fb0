"""Full-model numeric parity: our JAX MatchaTTS + converter vs a torch oracle.

The strongest parity evidence available without the released checkpoints:
initialize our flax model, export its weights through the torch-naming
converter, load them into an independently written torch implementation of
the reference's forward pass (tests/torch_oracle.py, strict name matching),
and require the synthesized mels to agree to the BASELINE budget
(mel-MAE < 1e-2; observed ~1e-5).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow


from emojivoice_tpu.io.torch_ckpt import export_matcha_state_dict
from emojivoice_tpu.models import MatchaTTS

from tests.test_models import tiny_cfg
from tests.torch_oracle import MatchaOracle


def _make_pair(cfg):
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1, 8), jnp.int32)
    y = jnp.zeros((1, 16, cfg.n_feats))
    params = model.init({"params": rng, "dropout": rng}, x, jnp.array([8]), y,
                        jnp.array([16]), jnp.array([0]), rng=rng)

    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    sd.pop("mel_mean")
    sd.pop("mel_std")
    oracle = MatchaOracle(cfg)
    missing, unexpected = oracle.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, strict=False
    )
    # strict name accounting: nothing unexpected, nothing missing
    assert unexpected == [], unexpected
    assert missing == [], missing
    oracle.eval()
    return cfg, model, params, oracle


@pytest.fixture(scope="module")
def pair():
    return _make_pair(tiny_cfg())  # n_spks=3, n_feats=12, 2 enc layers, (16,16) decoder


@pytest.mark.parametrize("steps,tx_len", [(2, 12), (4, 16)])
def test_synthesise_parity(pair, steps, tx_len):
    cfg, model, params, oracle = pair
    TX, TY = 16, 48
    rng = np.random.default_rng(steps)
    x_np = np.zeros((2, TX), np.int32)
    x_np[0, :tx_len] = rng.integers(1, 150, tx_len)
    x_np[1, : tx_len - 4] = rng.integers(1, 150, tx_len - 4)
    xl = np.array([tx_len, tx_len - 4], np.int32)
    spks = np.array([1, 2], np.int32)
    z_np = rng.normal(size=(2, TY, cfg.n_feats)).astype(np.float32) * 0.667

    ours = model.apply(
        {"params": jax.device_get(params)["params"]},
        jnp.asarray(x_np), jnp.asarray(xl), TY, steps, 0.667, jnp.asarray(spks), 1.0,
        None, jnp.asarray(z_np), method=MatchaTTS.synthesise,
    )

    theirs = oracle.synthesise(
        torch.from_numpy(x_np.astype(np.int64)), torch.from_numpy(xl.astype(np.int64)),
        TY, steps, 0.667, torch.from_numpy(spks.astype(np.int64)), 1.0,
        torch.from_numpy(z_np.transpose(0, 2, 1)),
    )

    np.testing.assert_array_equal(np.asarray(ours["mel_lengths"]), theirs["mel_lengths"].numpy())
    for i in range(2):
        ml = int(ours["mel_lengths"][i])
        ours_mel = np.asarray(ours["mel"][i][:ml])  # (T, C)
        ref_mel = theirs["mel"][i, :, :ml].numpy().T
        mae = float(np.abs(ours_mel - ref_mel).mean())
        assert mae < 1e-2, f"mel-MAE {mae} over budget"
        assert mae < 1e-4, f"mel-MAE {mae} unexpectedly high for same-weights parity"
    # alignment matrices identical
    np.testing.assert_allclose(np.asarray(ours["attn"]), theirs["attn"].numpy(), atol=1e-5)


def test_synthesise_parity_flagship(rng):
    """Same-weights parity at the PRODUCTION config — emoji_multi flagship
    (n_spks=109, 192-ch/6-layer encoder, 768 filter channels, (256,256)
    decoder, real head dims).  Short sequences keep CPU runtime sane; what
    this catches is size-dependent layout/rounding drift (e.g. the
    reference's int(k_channels*0.5) RoPE truncation, text_encoder.py:203)
    that a tiny config can never exercise.
    Reference: configs/model/matcha.yaml + configs/data/emoji_multi.yaml."""
    from emojivoice_tpu.config import get_preset

    cfg, model, params, oracle = _make_pair(get_preset("emoji_multi").model)
    assert cfg.n_spks == 109 and cfg.encoder.n_channels == 192 and cfg.decoder.channels == (256, 256)

    TX, TY, steps = 16, 48, 2
    x_np = np.zeros((2, TX), np.int32)
    x_np[0, :14] = rng.integers(1, 170, 14)
    x_np[1, :10] = rng.integers(1, 170, 10)
    xl = np.array([14, 10], np.int32)
    spks = np.array([79, 107], np.int32)  # real emoji-voice speaker ids
    z_np = rng.normal(size=(2, TY, cfg.n_feats)).astype(np.float32) * 0.667

    ours = model.apply(
        {"params": jax.device_get(params)["params"]},
        jnp.asarray(x_np), jnp.asarray(xl), TY, steps, 0.667, jnp.asarray(spks), 1.0,
        None, jnp.asarray(z_np), method=MatchaTTS.synthesise,
    )
    theirs = oracle.synthesise(
        torch.from_numpy(x_np.astype(np.int64)), torch.from_numpy(xl.astype(np.int64)),
        TY, steps, 0.667, torch.from_numpy(spks.astype(np.int64)), 1.0,
        torch.from_numpy(z_np.transpose(0, 2, 1)),
    )

    np.testing.assert_array_equal(np.asarray(ours["mel_lengths"]), theirs["mel_lengths"].numpy())
    for i in range(2):
        ml = int(ours["mel_lengths"][i])
        mae = float(np.abs(np.asarray(ours["mel"][i][:ml]) - theirs["mel"][i, :, :ml].numpy().T).mean())
        assert mae < 1e-2, f"mel-MAE {mae} over BASELINE budget at flagship size"
        assert mae < 1e-3, f"mel-MAE {mae} unexpectedly high for same-weights parity"
    np.testing.assert_allclose(np.asarray(ours["attn"]), theirs["attn"].numpy(), atol=1e-5)


def test_encoder_parity(pair):
    """mu_x / durations agree (isolates encoder from the CFM loop)."""
    cfg, model, params, oracle = pair
    TX = 16
    rng = np.random.default_rng(7)
    x_np = np.zeros((1, TX), np.int32)
    x_np[0, :10] = rng.integers(1, 150, 10)
    xl = np.array([10], np.int32)
    spks = np.array([2], np.int32)

    mu_x, w_ceil, y_lengths, x_mask, spk_e = model.apply(
        {"params": jax.device_get(params)["params"]},
        jnp.asarray(x_np), jnp.asarray(xl), jnp.asarray(spks), 1.0,
        method=MatchaTTS.encode_text,
    )

    with torch.no_grad():
        spk_t = oracle.spk_emb(torch.from_numpy(spks.astype(np.int64)))
        xm = (torch.arange(TX)[None, :] < torch.from_numpy(xl.astype(np.int64))[:, None]).float().unsqueeze(1)
        mu_ref, logw_ref = oracle.encoder(torch.from_numpy(x_np.astype(np.int64)), xm, spk_t)

    np.testing.assert_allclose(np.asarray(mu_x)[0].T, mu_ref[0].numpy(), atol=2e-5)
    w_ref = np.ceil(np.exp(logw_ref[0, 0].numpy()) * xm[0, 0].numpy())
    np.testing.assert_allclose(np.asarray(w_ceil)[0, :, 0], w_ref, atol=1e-5)
