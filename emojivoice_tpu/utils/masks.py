"""Mask / alignment-path helpers.

JAX re-designs of the reference's model math utilities
(reference: Matcha-TTS/matcha/utils/model.py:7-46).  All functions are
shape-static and jit-safe; lengths are traced values, max lengths are
Python ints (bucket sizes).
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask ``(B, max_length)``; True where position < length.

    Reference semantics: matcha/utils/model.py:7-11 (but max_length is a
    static bucket size here — XLA requires static shapes).
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def fix_len_compatibility(length: int, num_downsamplings_in_unet: int = 2) -> int:
    """Round length up to a multiple of 2**num_downsamplings (static version).

    Reference semantics: matcha/utils/model.py:14-20.
    """
    factor = 2 ** num_downsamplings_in_unet
    return int(-(-length // factor) * factor)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Duration → binary monotone alignment matrix.

    Args:
      duration: ``(B, T_text)`` integer-valued (float) durations.
      mask: ``(B, T_text, T_mel)`` attention mask.

    Returns ``(B, T_text, T_mel)`` with row x set for mel frames
    ``[cum(x-1), cum(x))``.

    Reference semantics: matcha/utils/model.py:29-41 (cumsum → per-row
    sequence-mask → first-difference along the text axis).
    """
    b, t_x, t_y = mask.shape
    cum = jnp.cumsum(duration, axis=1)  # (B, T_text)
    pos = jnp.arange(t_y, dtype=duration.dtype)
    # path_cum[b, x, y] = y < cum[b, x]
    path_cum = (pos[None, None, :] < cum[:, :, None]).astype(mask.dtype)
    path = path_cum - jnp.pad(path_cum, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


def intersperse(seq, item=0):
    """Insert `item` between and around every element (host-side, Python list).

    Reference semantics: matcha/utils/utils.py:131-135 — blank id 0 is
    interspersed around every phoneme id before embedding.
    """
    out = [item] * (len(seq) * 2 + 1)
    out[1::2] = list(seq)
    return out
