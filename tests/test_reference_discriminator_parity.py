"""GAN discriminator parity against the REAL reference code.

Oracle: the actual `/root/reference/Matcha-TTS/matcha/hifigan/models.py`
MultiPeriodDiscriminator / MultiScaleDiscriminator (+ feature_loss /
discriminator_loss / generator_loss, :209-368), imported directly (they are
torch-only).  Random-init torch modules in eval mode are converted through
the production converter (weight-norm fold for every conv; eval-semantics
spectral-norm division for MSD scale 0, models.py:278-280) and our
channels-last flax discriminators must reproduce every scale's logits,
every feature map, and all three GAN losses.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from emojivoice_tpu.io.torch_ckpt import convert_mpd_state_dict, convert_msd_state_dict
from emojivoice_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


def _ref_models():
    sys.path.insert(0, "/root/reference/Matcha-TTS")
    try:
        from matcha.hifigan import models as ref
    finally:
        sys.path.pop(0)
    return ref


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    # T chosen indivisible by every period (2,3,5,7,11) so the reflect-pad
    # branch runs, and odd so the MSD avg-pool edge behavior is exercised.
    y = (rng.normal(size=(2, 1013)) * 0.3).astype(np.float32)
    y_hat = (rng.normal(size=(2, 1013)) * 0.3).astype(np.float32)
    return y, y_hat


def _torch_all(mod, y, y_hat):
    with torch.no_grad():
        r, g, fr, fg = mod(torch.from_numpy(y[:, None, :]), torch.from_numpy(y_hat[:, None, :]))
    return ([o.numpy() for o in r], [o.numpy() for o in g],
            [[f.numpy() for f in fm] for fm in fr], [[f.numpy() for f in fg_] for fg_ in fg])


def _to_torch_layout(f):
    """Ours (B, H, W, C) / (B, T, C) → torch (B, C, H, W) / (B, C, T)."""
    f = np.asarray(f)
    return f.transpose(0, 3, 1, 2) if f.ndim == 4 else f.transpose(0, 2, 1)


def _check(ref_out, our_out, atol):
    r_r, g_r, fr_r, fg_r = ref_out
    r_o, g_o, fr_o, fg_o = our_out
    assert len(r_r) == len(r_o)
    for a, b in zip(r_r, r_o):
        np.testing.assert_allclose(np.asarray(b), a, atol=atol)
    for a, b in zip(g_r, g_o):
        np.testing.assert_allclose(np.asarray(b), a, atol=atol)
    for fm_r, fm_o in zip(fr_r + fg_r, fr_o + fg_o):
        assert len(fm_r) == len(fm_o)
        for a, b in zip(fm_r, fm_o):
            np.testing.assert_allclose(_to_torch_layout(b), a, atol=atol)


def test_mpd_parity_vs_reference_code(data):
    ref = _ref_models()
    torch.manual_seed(21)
    tm = ref.MultiPeriodDiscriminator().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_mpd_state_dict(sd)

    y, y_hat = data
    ref_out = _torch_all(tm, y, y_hat)
    ours = MultiPeriodDiscriminator()
    our_out = ours.apply(params, jnp.asarray(y), jnp.asarray(y_hat))
    _check(ref_out, our_out, atol=2e-4)

    # the three GAN losses through the SAME reference functions vs ours
    _loss_parity(ref, ref_out, our_out)


def test_msd_parity_vs_reference_code(data):
    """Covers the spectral-norm scale-0 path (models.py:278,320) — the
    converter must divide weight_orig by sigma(u, v) exactly as torch eval
    does."""
    ref = _ref_models()
    torch.manual_seed(22)
    tm = ref.MultiScaleDiscriminator()
    _settle_spectral_norm(tm)
    sd_keys = set(tm.state_dict().keys())
    assert any(k.endswith("weight_orig") for k in sd_keys), "expected spectral-norm scale 0"
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_msd_state_dict(sd)

    y, y_hat = data
    ref_out = _torch_all(tm, y, y_hat)
    ours = MultiScaleDiscriminator()
    our_out = ours.apply(params, jnp.asarray(y), jnp.asarray(y_hat))
    _check(ref_out, our_out, atol=2e-4)
    _loss_parity(ref, ref_out, our_out)


def _settle_spectral_norm(tm, iters: int = 30):
    """Power-iterate the spectral-norm u/v buffers to convergence, then eval.

    Fresh random u/v give sigma ≈ 0 (u ⊥ Wv), so weight_orig/sigma explodes
    to ~1e11 and f32 parity at that scale is vacuous.  Trained checkpoints
    always carry converged vectors; forwards in train mode reproduce that."""
    tm.train()
    with torch.no_grad():
        x = torch.zeros(1, 1, 512)
        for _ in range(iters):
            tm(x, x)
    tm.eval()


def _loss_parity(ref, ref_out, our_out):
    r_r, g_r, fr_r, fg_r = ref_out
    r_o, g_o, fr_o, fg_o = our_out

    want_fm = float(ref.feature_loss([[torch.from_numpy(f) for f in fm] for fm in fr_r],
                                     [[torch.from_numpy(f) for f in fm] for fm in fg_r]))
    got_fm = float(feature_loss(fr_o, fg_o))
    np.testing.assert_allclose(got_fm, want_fm, rtol=1e-4)

    want_d, want_rs, want_gs = ref.discriminator_loss(
        [torch.from_numpy(a) for a in r_r], [torch.from_numpy(a) for a in g_r])
    got_d, got_rs, got_gs = discriminator_loss(r_o, g_o)
    np.testing.assert_allclose(float(got_d), float(want_d), rtol=1e-4)
    np.testing.assert_allclose([float(x) for x in got_rs], want_rs, rtol=1e-4)
    np.testing.assert_allclose([float(x) for x in got_gs], want_gs, rtol=1e-4)

    want_g, _ = ref.generator_loss([torch.from_numpy(a) for a in g_r])
    got_g, _ = generator_loss(g_o)
    np.testing.assert_allclose(float(got_g), float(want_g), rtol=1e-4)


def test_do_checkpoint_roundtrip(tmp_path):
    """A torch-saved upstream `do_*` training checkpoint loads through the
    torch-free reader into both discriminators (warm-start path)."""
    ref = _ref_models()
    torch.manual_seed(23)
    tm_p = ref.MultiPeriodDiscriminator().eval()
    tm_s = ref.MultiScaleDiscriminator()
    _settle_spectral_norm(tm_s)
    path = tmp_path / "do_00000001"
    torch.save({"mpd": tm_p.state_dict(), "msd": tm_s.state_dict(),
                "steps": 1, "epoch": 0}, str(path))

    from emojivoice_tpu.io.torch_ckpt import load_hifigan_discriminators

    loaded = load_hifigan_discriminators(str(path))
    rng = np.random.default_rng(3)
    y = (rng.normal(size=(1, 505)) * 0.2).astype(np.float32)
    y2 = (rng.normal(size=(1, 505)) * 0.2).astype(np.float32)

    ref_out = _torch_all(tm_p, y, y2)
    our_out = MultiPeriodDiscriminator().apply(loaded["mpd"], jnp.asarray(y), jnp.asarray(y2))
    _check(ref_out, our_out, atol=2e-4)

    ref_out = _torch_all(tm_s, y, y2)
    our_out = MultiScaleDiscriminator().apply(loaded["msd"], jnp.asarray(y), jnp.asarray(y2))
    _check(ref_out, our_out, atol=2e-4)
