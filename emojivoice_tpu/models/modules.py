"""Shared flax.linen building blocks (channels-last).

Parameter layouts are chosen for the TPU hot path (kernels ``(k, in, out)``,
dense ``(in, out)``); the torch-checkpoint converter in
``emojivoice_tpu.io.torch_ckpt`` maps the reference layouts onto these once
at load time.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.ops.convs import conv1d, conv_transpose1d, conv_transpose1d_subpixel


class Conv1d(nn.Module):
    """torch.nn.Conv1d-equivalent in (B, T, C) layout.

    weight_norm=True uses the torch weight_norm(dim=0) reparameterization —
    kernel = g · v/‖v‖ with one magnitude g per OUTPUT channel — so GAN
    fine-tuning trains in the same optimizer geometry as upstream HiFi-GAN
    (which keeps weight_norm active during training and folds it only for
    inference, reference: hifigan/models.py:199-206)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        if self.weight_norm:
            v = self.param("v", nn.initializers.lecun_normal(), kshape)
            g = self.param("g", nn.initializers.ones, (self.features,))
            # torch dim=0: per-out-channel norm over (k, in)
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
            kernel = g[None, None, :] * v / norm
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return conv1d(x, kernel, bias, stride=self.stride, padding=self.padding, dilation=self.dilation)


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d-equivalent in (B, T, C) layout.

    subpixel=True lowers via phase decomposition (dense conv +
    depth-to-space) instead of an input-dilated conv — numerically
    identical, often faster for large-stride upsampling on TPU."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    subpixel: bool = False
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        kshape = (self.kernel_size, x.shape[-1], self.features)
        if self.weight_norm:
            v = self.param("v", nn.initializers.lecun_normal(), kshape)
            # torch weight shape is (in, out, k) and weight_norm uses dim=0,
            # so the magnitude is per INPUT channel here
            g = self.param("g", nn.initializers.ones, (x.shape[-1],))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2), keepdims=True))
            kernel = g[None, :, None] * v / norm
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        fn = conv_transpose1d_subpixel if self.subpixel else conv_transpose1d
        return fn(x, kernel, bias, stride=self.stride, padding=self.padding)


class ChannelLayerNorm(nn.Module):
    """The glow-tts LayerNorm variant the reference text encoder uses: it
    normalizes the *channel* axis (reference: text_encoder.py:15-33,
    eps=1e-4).  In channels-last layout that is simply LayerNorm over the
    last axis — no transposes needed on TPU."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def snake_beta(x, alpha_log: jnp.ndarray, beta_log: jnp.ndarray, eps: float = 1e-9):
    """SnakeBeta activation: x + 1/β · sin²(αx), log-scale trainable α, β
    (reference: transformer.py:64-80 with alpha_logscale=True)."""
    alpha = jnp.exp(alpha_log)
    beta = jnp.exp(beta_log)
    s = jnp.sin(x * alpha)
    return x + (1.0 / (beta + eps)) * s * s


def masked_fill(scores: jnp.ndarray, mask: jnp.ndarray, value: float = -1e4) -> jnp.ndarray:
    """Reference-parity mask fill (text_encoder.py:241 uses −1e4, not −inf)."""
    return jnp.where(mask == 0, jnp.asarray(value, scores.dtype), scores)


class Dropout(nn.Module):
    """Dropout gated on a `deterministic` call argument, rng name 'dropout'."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


def time_broadcast(spks: Optional[jnp.ndarray], t_len: int) -> Optional[jnp.ndarray]:
    """(B, C) speaker embedding → (B, T, C)."""
    if spks is None:
        return None
    return jnp.broadcast_to(spks[:, None, :], (spks.shape[0], t_len, spks.shape[-1]))
