"""HiFi-GAN discriminators and GAN losses.

Behavioral equivalents of the reference's (training-only) discriminators
(reference: Matcha-TTS/matcha/hifigan/models.py:209-368).  The reference
repo never trains its vocoder — these exist for capability parity so the
vocoder *can* be (fine-)tuned on TPU.  Channels-last layouts throughout;
the period discriminators fold the waveform into (T/p, p) images and run
2-D convs (NHWC).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

LRELU_SLOPE = 0.1


class DiscriminatorP(nn.Module):
    """Period discriminator (reference: models.py:209-248)."""

    period: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T) → (B, T/p, p, 1)
        b, t = x.shape
        p = self.period
        if t % p != 0:
            pad = p - (t % p)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            t = t + pad
        h = x.reshape(b, t // p, p, 1)

        fmap = []
        for i, ch in enumerate((32, 128, 512, 1024)):
            h = nn.Conv(ch, (5, 1), strides=(3, 1), padding=((2, 2), (0, 0)), name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1024, (5, 1), strides=(1, 1), padding=((2, 2), (0, 0)), name="convs_4")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Periods 2,3,5,7,11 (reference: models.py:251-273)."""

    periods: tuple = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"discriminators_{i}")
            r_out, r_fmap = d(y)
            g_out, g_fmap = d(y_hat)
            y_d_rs.append(r_out)
            y_d_gs.append(g_out)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator (reference: models.py:276-306)."""

    @nn.compact
    def __call__(self, x):
        # x: (B, T) → (B, T, 1)
        h = x[..., None]
        specs = [
            (128, 15, 1, 1),
            (128, 41, 2, 4),
            (256, 41, 2, 16),
            (512, 41, 4, 16),
            (1024, 41, 4, 16),
            (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        fmap = []
        for i, (ch, k, s, g) in enumerate(specs):
            h = nn.Conv(ch, (k,), strides=(s,), padding=((k // 2, k // 2),),
                        feature_group_count=g, name=f"convs_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = nn.Conv(1, (3,), padding=((1, 1),), name="conv_post")(h)
        fmap.append(h)
        return h.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scales with ×2 avg-pool between (reference: models.py:309-334)."""

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = nn.avg_pool(y[..., None], (4,), strides=(2,), padding=((2, 2),))[..., 0]
                y_hat = nn.avg_pool(y_hat[..., None], (4,), strides=(2,), padding=((2, 2),))[..., 0]
            d = DiscriminatorS(name=f"discriminators_{i}")
            r_out, r_fmap = d(y)
            g_out, g_fmap = d(y_hat)
            y_d_rs.append(r_out)
            y_d_gs.append(g_out)
            fmap_rs.append(r_fmap)
            fmap_gs.append(g_fmap)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def feature_loss(fmap_r: List, fmap_g: List) -> jnp.ndarray:
    """L1 feature-matching ×2 (reference: models.py:337-343)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(disc_real, disc_gen) -> Tuple[jnp.ndarray, list, list]:
    """LSGAN discriminator loss (reference: models.py:346-356)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r_loss = jnp.mean(jnp.square(1 - dr))
        g_loss = jnp.mean(jnp.square(dg))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs) -> Tuple[jnp.ndarray, list]:
    """LSGAN generator loss (reference: models.py:359-368)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1 - dg))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
