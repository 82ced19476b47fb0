"""FULL training forward parity against the REAL reference MatchaTTS.

The per-module chain is already pinned against reference code (encoder:
test_reference_encoder_parity, U-Net/CFM: test_reference_decoder_parity,
losses: test_training_parity vs manual numpy).  What remained self-authored
was the composition: `MatchaTTS.forward` itself — MAS log-prior, duration
loss, the Grad-TTS out_size crop, prior loss and the CFM loss all wired
together (reference: matcha_tts.py:154-245).  Here the real reference model
is built from an export of OUR random-init flagship params
(tests/reference_harness.build_reference_matcha — the parity_report path)
and both training forwards must agree with identical injected randomness:

- t/z (the CFM draws) pinned by patching torch.rand / torch.randn_like on
  the reference side and passing t=/z= into our forward;
- MAS is deterministic given the log-prior (binary DP);
- the out_size crop case is constructed with max_offset == 0 for every row
  (y_lengths <= out_size), where the reference's random.choice degenerates
  to offset 0 — so both crops are deterministic (matcha_tts.py:211-216).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.reference_harness import build_reference_matcha

pytestmark = pytest.mark.slow

B, TX, TY = 2, 14, 32


@pytest.fixture(scope="module")
def pair():
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu.config import get_preset
    from emojivoice_tpu.io.torch_ckpt import export_matcha_hparams, export_matcha_state_dict
    from emojivoice_tpu.models import MatchaTTS

    cfg = get_preset("emoji_multi").model
    model = MatchaTTS(cfg=cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        jnp.ones((1, 8), jnp.int32), jnp.array([8]),
        jnp.zeros((1, 16, cfg.n_feats)), jnp.array([16]), jnp.array([0]), rng=rng,
    )
    sd = export_matcha_state_dict(jax.device_get(params), cfg)
    ref = build_reference_matcha(export_matcha_hparams(cfg), sd)
    return cfg, model, params, ref


def _batch(cfg, y_lengths=(32, 26), seed=0):
    rng = np.random.default_rng(seed)
    x = np.zeros((B, TX), np.int32)
    x[0, :TX] = rng.integers(1, cfg.n_vocab, TX)
    x[1, :9] = rng.integers(1, cfg.n_vocab, 9)
    xl = np.array([TX, 9], np.int32)
    y = rng.normal(size=(B, TY, cfg.n_feats)).astype(np.float32)
    yl = np.array(y_lengths, np.int32)
    y *= (np.arange(TY)[None, :, None] < yl[:, None, None])
    spks = np.array([3, 101], np.int32)
    return x, xl, y, yl, spks


def _run_ref(ref, cfg, batch, t_fix, z_fix, out_size, monkeypatch):
    x, xl, y, yl, spks = batch
    monkeypatch.setattr(torch, "rand", lambda *a, **k: torch.from_numpy(t_fix.copy()))
    monkeypatch.setattr(torch, "randn_like", lambda _t: torch.from_numpy(z_fix.copy()))
    with torch.no_grad():
        dur, prior, diff, attn = ref(
            torch.from_numpy(x).long(), torch.from_numpy(xl).long(),
            torch.from_numpy(y.transpose(0, 2, 1)).contiguous(), torch.from_numpy(yl).long(),
            spks=torch.from_numpy(spks).long(), out_size=out_size,
        )
    return float(dur), float(prior), float(diff), attn.numpy()


def _run_ours(model, params, batch, t_fix, z_fix, out_size):
    import jax
    import jax.numpy as jnp

    x, xl, y, yl, spks = batch
    return model.apply(
        params, jnp.asarray(x), jnp.asarray(xl), jnp.asarray(y), jnp.asarray(yl),
        spks=jnp.asarray(spks), out_size=out_size, rng=jax.random.PRNGKey(9),
        deterministic=True, t=jnp.asarray(t_fix), z=jnp.asarray(z_fix.transpose(0, 2, 1)),
    )


def test_training_forward_parity_full_length(pair, monkeypatch):
    """out_size=None: MAS + dur/prior/diff losses over the whole mel."""
    cfg, model, params, ref = pair
    batch = _batch(cfg)
    rng = np.random.default_rng(7)
    t_fix = rng.uniform(size=(B, 1, 1)).astype(np.float32)
    z_fix = rng.normal(size=(B, cfg.n_feats, TY)).astype(np.float32)

    dur_r, prior_r, diff_r, attn_r = _run_ref(ref, cfg, batch, t_fix, z_fix, None, monkeypatch)
    dur_j, prior_j, diff_j, attn_j = _run_ours(model, params, batch, t_fix, z_fix, None)

    # MAS alignment is a binary path: must match exactly
    assert np.array_equal(np.asarray(attn_j), attn_r), "MAS paths diverge"
    np.testing.assert_allclose(float(dur_j), dur_r, rtol=1e-5)
    np.testing.assert_allclose(float(prior_j), prior_r, rtol=1e-5)
    np.testing.assert_allclose(float(diff_j), diff_r, rtol=2e-5)


def test_training_forward_parity_out_size_crop(pair, monkeypatch):
    """Grad-TTS out_size crop (matcha_tts.py:209-231) with max_offset == 0
    rows so both sides' random offsets degenerate to 0: crop slicing,
    y_cut_lengths clamp and the post-crop loss masks all line up."""
    cfg, model, params, ref = pair
    out_size = 28  # < TY so our crop branch runs; >= every y_length
    batch = _batch(cfg, y_lengths=(28, 24), seed=1)
    rng = np.random.default_rng(8)
    t_fix = rng.uniform(size=(B, 1, 1)).astype(np.float32)
    z_fix = rng.normal(size=(B, cfg.n_feats, out_size)).astype(np.float32)

    dur_r, prior_r, diff_r, _ = _run_ref(ref, cfg, batch, t_fix, z_fix, out_size, monkeypatch)
    dur_j, prior_j, diff_j, _ = _run_ours(model, params, batch, t_fix, z_fix, out_size)

    np.testing.assert_allclose(float(dur_j), dur_r, rtol=1e-5)
    np.testing.assert_allclose(float(prior_j), prior_r, rtol=1e-5)
    np.testing.assert_allclose(float(diff_j), diff_r, rtol=2e-5)
