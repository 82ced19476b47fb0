"""Rotary positional embeddings, partial-dim variant.

The reference applies RoPE to only the first ``int(head_dim * 0.5)`` dims of
each attention head (reference: text_encoder.py:97-172,203-204 — note the
``int()`` truncation convention, labml-style "neg-half" rotation).  Computed
in closed form at trace time; cos/sin tables are constants folded by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_tables(seq_len: int, d: int, base: float = 10_000.0):
    """cos/sin tables of shape (seq_len, d); d must be even."""
    theta = 1.0 / (base ** (np.arange(0, d, 2, dtype=np.float64) / d))  # (d/2,)
    idx_theta = np.arange(seq_len, dtype=np.float64)[:, None] * theta[None, :]  # (T, d/2)
    idx_theta2 = np.concatenate([idx_theta, idx_theta], axis=1)  # (T, d)
    return (
        np.cos(idx_theta2).astype(np.float32),
        np.sin(idx_theta2).astype(np.float32),
    )


def apply_rope(x: jnp.ndarray, rope_dim: int, base: float = 10_000.0) -> jnp.ndarray:
    """Rotate the first `rope_dim` feature dims of x (B, H, T, D); pass the rest.

    neg-half convention: rotated = x·cos + [-x[d/2:], x[:d/2]]·sin.
    """
    d = rope_dim
    if d == 0:
        return x
    t = x.shape[-2]
    cos, sin = rope_tables(t, d, base)
    cos = jnp.asarray(cos, x.dtype)
    sin = jnp.asarray(sin, x.dtype)

    x_rope, x_pass = x[..., :d], x[..., d:]
    neg_half = jnp.concatenate([-x_rope[..., d // 2 :], x_rope[..., : d // 2]], axis=-1)
    x_rope = x_rope * cos + neg_half * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)
