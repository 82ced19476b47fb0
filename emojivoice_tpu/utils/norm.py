"""Mel normalization by dataset statistics.

Reference semantics: matcha/utils/model.py:49-90 — but arrays here are
channels-last ``(..., T, n_mels)`` so per-mel stats broadcast over the
trailing axis naturally.
"""

from __future__ import annotations

import jax.numpy as jnp


def _as_row(v, dtype):
    v = jnp.asarray(v, dtype=dtype)
    if v.ndim == 0:
        return v
    return v  # (n_mels,) broadcasts against (..., T, n_mels)


def normalize(data: jnp.ndarray, mu, std) -> jnp.ndarray:
    return (data - _as_row(mu, data.dtype)) / _as_row(std, data.dtype)


def denormalize(data: jnp.ndarray, mu, std) -> jnp.ndarray:
    return data * _as_row(std, data.dtype) + _as_row(mu, data.dtype)
