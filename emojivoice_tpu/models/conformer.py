"""Conformer block — the decoder's alternative block type, numerics-exact.

The reference can build its U-Net with conformer blocks instead of
transformer blocks (reference: decoder.py:161-197 ``ConformerWrapper``
subclassing the lucidrains ``conformer==0.3.2`` package's ``ConformerBlock``,
selected via down/mid/up_block_type="conformer"; config-default is
"transformer").  This is a channels-last implementation of the *exact*
published math so conformer-config checkpoints convert and reproduce:

  x += ½·FFN₁(LN x)                    (swish MLP, mult=ff_mult)
  x += Attn(LN x)                      (Shaw relative-position attention,
                                        fused kv projection, max_pos_emb=512)
  x += Conv(x)                         (LN → 1×1 conv ×2 expansion → GLU →
                                        depthwise k=31 → BatchNorm → swish →
                                        1×1 conv; *unmasked*, as upstream)
  x += ½·FFN₂(LN x)
  x = LN x

Deliberate reference-parity quirks carried over:
  - the convolution module ignores the sequence mask entirely (upstream
    ``ConformerConvModule`` has no mask argument), so padded frames bleed
    into the conv halo and into train-mode BatchNorm statistics;
  - attention masks both the query and key side with ``-finfo.max`` (a
    fully-masked query row softmaxes to uniform attention, exactly as
    ``masked_fill`` does in torch);
  - BatchNorm follows torch semantics: biased variance for normalization,
    unbiased variance into the running average, momentum 0.1.  Running
    statistics live in the ``batch_stats`` collection; training steps thread
    them via ``mutable=["batch_stats"]`` (see training/state.py).

Defaults mirror the reference wrapper's instantiation (decoder.py:318-331):
ff_mult=1, conv_expansion_factor=2, conv_kernel_size=31, non-causal.
Pinned against the real reference ``ConformerWrapper``/``Decoder`` code in
tests/test_reference_conformer_parity.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.models.modules import Dropout
from emojivoice_tpu.ops.convs import conv1d


class TorchBatchNorm(nn.Module):
    """torch.nn.BatchNorm1d semantics on (B, T, C): per-channel statistics
    over (B, T); biased variance normalizes, unbiased variance feeds the
    running average (momentum 0.1).  Stats update only when the
    ``batch_stats`` collection is mutable in the enclosing apply."""

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.mean(jnp.square(x - mean), axis=axes)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                n = x.size / self.features
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * scale + bias


class ConformerFFN(nn.Module):
    """LN → dense(mult·dim) → swish → dropout → dense(dim) → dropout."""

    mult: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = nn.Dense(dim * self.mult, name="in_proj")(h)
        h = nn.silu(h)
        h = Dropout(self.dropout)(h, deterministic)
        h = nn.Dense(dim, name="out_proj")(h)
        return Dropout(self.dropout)(h, deterministic)


class ConformerConvModule(nn.Module):
    """LN → pointwise ×2-expansion → GLU → depthwise conv → BatchNorm →
    swish → pointwise → dropout.  No masking (upstream parity)."""

    expansion: int = 2
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        inner = dim * self.expansion
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = nn.Dense(inner * 2, name="pointwise_in")(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(g)
        # calc_same_padding: (k//2, k//2 - (k+1) % 2) — asymmetric for even k
        k = self.kernel_size
        pad = (k // 2, k // 2 - (k + 1) % 2)
        h = jnp.pad(h, ((0, 0), pad, (0, 0)))
        w = self.param("depthwise_kernel", nn.initializers.lecun_normal(), (k, 1, inner))
        b = self.param("depthwise_bias", nn.initializers.zeros, (inner,))
        h = conv1d(h, w, b, groups=inner)
        h = TorchBatchNorm(inner, name="bn")(h, use_running_average=deterministic)
        h = nn.silu(h)
        h = nn.Dense(dim, name="pointwise_out")(h)
        return Dropout(self.dropout)(h, deterministic)


class ConformerAttention(nn.Module):
    """Pre-norm attention with Shaw relative-position bias
    (lucidrains conformer ``Attention``): fused kv projection, per-distance
    embedding table of (2·max_pos_emb+1, head_dim), distances clamped to
    ±max_pos_emb; dropout on the output projection."""

    heads: int = 4
    head_dim: int = 64
    dropout: float = 0.0
    max_pos_emb: int = 512

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, t, dim = x.shape
        inner = self.heads * self.head_dim
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(h)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(z):
            return z.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = jnp.asarray(self.head_dim, x.dtype) ** -0.5
        dots = jnp.einsum("bhqc,bhkc->bhqk", q, k) * scale

        # Shaw relative positions: gather per-(i,j) distance columns from the
        # (b, h, t, 2M+1) q·E table instead of materializing the (t, t, d)
        # embedding tensor — same numerics, TPU-friendly memory.
        emb = self.param(
            "rel_pos_emb",
            nn.initializers.normal(1.0),
            (2 * self.max_pos_emb + 1, self.head_dim),
        )
        seq = jnp.arange(t)
        dist = jnp.clip(seq[:, None] - seq[None, :], -self.max_pos_emb, self.max_pos_emb) \
            + self.max_pos_emb
        qe = jnp.einsum("bhqc,rc->bhqr", q, emb.astype(x.dtype)) * scale
        pos_attn = jnp.take_along_axis(qe, dist[None, None], axis=-1)
        dots = dots + pos_attn

        if mask is not None:
            key_mask = mask[..., 0] if mask.ndim == 3 else mask  # (B, T)
            pair = (key_mask[:, None, :, None] > 0) & (key_mask[:, None, None, :] > 0)
            dots = jnp.where(pair, dots, -jnp.finfo(dots.dtype).max)

        p = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", p, v).transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(dim, name="to_out")(out)
        return Dropout(self.dropout)(out, deterministic)


class ConformerBlock(nn.Module):
    """Signature-compatible with BasicTransformerBlock inside the U-Net."""

    dim: int
    heads: int = 4
    head_dim: int = 64
    dropout: float = 0.0
    ff_mult: int = 1
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    max_pos_emb: int = 512

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        x = x + 0.5 * ConformerFFN(self.ff_mult, self.dropout, name="ff1")(x, deterministic)
        x = x + ConformerAttention(self.heads, self.head_dim, self.dropout, self.max_pos_emb,
                                   name="attn")(x, attn_mask, deterministic)
        x = x + ConformerConvModule(self.conv_expansion_factor, self.conv_kernel_size,
                                    self.dropout, name="conv")(x, deterministic)
        x = x + 0.5 * ConformerFFN(self.ff_mult, self.dropout, name="ff2")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="post_norm")(x)
