"""HiFi-GAN generator + denoiser + discriminators."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.config import HiFiGANConfig
from emojivoice_tpu.vocoder import Denoiser, HiFiGANGenerator
from emojivoice_tpu.vocoder.discriminators import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


def tiny_hifigan():
    return HiFiGANConfig(
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        num_mels=12,
    )


@pytest.fixture(scope="module")
def voc():
    cfg = tiny_hifigan()
    model = HiFiGANGenerator(cfg=cfg)
    mel = jnp.zeros((1, 16, 12))
    params = model.init(jax.random.PRNGKey(0), mel)
    return cfg, model, params


def test_generator_upsampling_factor(voc):
    cfg, model, params = voc
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 12))
    wav = model.apply(params, mel)
    assert wav.shape == (2, 24 * cfg.total_upsample)
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh bound


def test_generator_full_v1_shapes():
    cfg = HiFiGANConfig()  # real v1: ×256
    model = HiFiGANGenerator(cfg=cfg)
    mel = jnp.zeros((1, 8, 80))
    params = model.init(jax.random.PRNGKey(0), mel)
    wav = model.apply(params, mel)
    assert wav.shape == (1, 8 * 256)
    n = sum(p.size for p in jax.tree.leaves(params))
    # reference v1 generator is ~13.9M params (weight-norm folded)
    assert 13.5e6 < n < 14.5e6


def test_denoiser(voc):
    cfg, model, params = voc
    den = Denoiser(lambda m: model.apply(params, m), num_mels=12)
    assert den.bias_spec.shape == (1, 1, 513)
    audio = jax.random.normal(jax.random.PRNGKey(2), (1, 4096)) * 0.1
    out = den(audio, strength=0.00025)
    assert out.shape[0] == 1
    assert np.isfinite(np.asarray(out)).all()
    # strength 0 ≈ identity resynthesis in the interior
    out0 = np.asarray(den(audio, strength=0.0))
    np.testing.assert_allclose(out0[0, 512:3000], np.asarray(audio)[0, 512:3000], atol=1e-3)


def test_discriminators_and_losses():
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 1024)) * 0.1
    y_hat = jax.random.normal(jax.random.PRNGKey(4), (1, 1024)) * 0.1

    mpd = MultiPeriodDiscriminator(periods=(2, 3))
    p = mpd.init(jax.random.PRNGKey(0), y, y_hat)
    r, g, fr, fg = mpd.apply(p, y, y_hat)
    assert len(r) == 2 and len(fr[0]) == 6

    msd = MultiScaleDiscriminator()
    p2 = msd.init(jax.random.PRNGKey(0), y, y_hat)
    r2, g2, fr2, fg2 = msd.apply(p2, y, y_hat)
    assert len(r2) == 3

    dl, _, _ = discriminator_loss(r, g)
    gl, _ = generator_loss(g)
    fl = feature_loss(fr, fg)
    for v in (dl, gl, fl):
        assert np.isfinite(float(v))


def test_subpixel_upsample_identical(voc):
    """Phase-decomposed upsample lowering == input-dilated lowering."""
    cfg, model, params = voc
    model_sp = HiFiGANGenerator(cfg=cfg, subpixel_upsample=True)
    mel = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 12))
    a = model.apply(params, mel)
    b = model_sp.apply(params, mel)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
