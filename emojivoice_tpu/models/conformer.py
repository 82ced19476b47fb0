"""Conformer block — the decoder's alternative block type.

The reference can build its U-Net with conformer blocks instead of
transformer blocks (reference: decoder.py:161-197 `ConformerWrapper` around
the lucidrains `conformer` package, selected via
down/mid/up_block_type="conformer"; config-default is "transformer").
Channels-last implementation of the same structure: half-step FFN →
self-attention → depthwise-conv module → half-step FFN → LayerNorm, with
the wrapper's call signature (mask only; timestep unused).

Defaults mirror the reference wrapper's instantiation: ff_mult=1,
conv_expansion_factor=2, conv_kernel_size=31, non-causal.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from emojivoice_tpu.models.modules import Conv1d, Dropout


class ConformerFFN(nn.Module):
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
    expansion: int = 2
    kernel_size: int = 31
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = x.shape[-1]
        inner = dim * self.expansion
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        h = nn.Dense(inner * 2, name="pointwise_in")(h)
        h = nn.glu(h, axis=-1)
        if mask is not None:
            h = h * mask
        h = Conv1d(inner, self.kernel_size, padding=self.kernel_size // 2, name="depthwise")(h)
        # batch-independent norm (swapped for the conformer's BatchNorm — a
        # running-stats-free choice that keeps the block purely functional)
        h = nn.LayerNorm(epsilon=1e-5, name="conv_norm")(h)
        h = nn.silu(h)
        h = nn.Dense(dim, name="pointwise_out")(h)
        return Dropout(self.dropout)(h, deterministic)


class ConformerAttention(nn.Module):
    heads: int = 4
    head_dim: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        b, t, dim = x.shape
        inner = self.heads * self.head_dim
        h = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)

        def split(z):
            return z.reshape(b, t, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqc,bhkc->bhqk", q, k) / jnp.sqrt(self.head_dim).astype(x.dtype)
        if mask is not None:
            key_mask = mask[..., 0]  # (B, T)
            scores = jnp.where(key_mask[:, None, None, :] > 0, scores,
                               jnp.asarray(-1e9, scores.dtype))
        p = jax.nn.softmax(scores, axis=-1)
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

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True):
        mask = attn_mask[..., None] if attn_mask is not None and attn_mask.ndim == 2 else attn_mask
        x = x + 0.5 * ConformerFFN(self.ff_mult, self.dropout, name="ff1")(x, deterministic)
        x = x + ConformerAttention(self.heads, self.head_dim, self.dropout, name="attn")(
            x, mask, deterministic)
        x = x + ConformerConvModule(self.conv_expansion_factor, self.conv_kernel_size,
                                    self.dropout, name="conv")(x, mask, deterministic)
        x = x + 0.5 * ConformerFFN(self.ff_mult, self.dropout, name="ff2")(x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="post_norm")(x)
