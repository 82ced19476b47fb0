"""1-D convolutions in channels-last ``(B, T, C)`` layout.

TPU-first design choice: channels-last puts the feature axis on the
128-wide vector lanes, so XLA lowers these convs onto the MXU as batched
matmuls without layout transposes.  (The torch reference is channels-first
``(B, C, T)``; weight layout there is ``(out, in, k)`` — converters in
``emojivoice_tpu.io.torch_ckpt`` transpose to our ``(k, in, out)``.)

Semantics (padding, stride, dilation, transposed-conv output size) match
``torch.nn.Conv1d`` / ``torch.nn.ConvTranspose1d`` exactly; verified by
parity tests against torch in tests/test_convs.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# lhs (B, T, C) ⋅ rhs (K, I, O) → out (B, T, O)
_DIMS = ("NHC", "HIO", "NHC")


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """torch.nn.functional.conv1d semantics, channels-last.

    Args:
      x: (B, T, C_in)
      w: (K, C_in // groups, C_out)
      b: (C_out,) or None
    """
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=_DIMS,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    precision=None,
) -> jnp.ndarray:
    """torch.nn.functional.conv_transpose1d semantics, channels-last.

    Implemented as an input-dilated (fractionally-strided) regular
    convolution with a flipped kernel — the form XLA pipelines best on TPU.
    Output length = (T-1)*stride - 2*padding + K, matching torch.

    Args:
      x: (B, T, C_in)
      w: (K, C_in, C_out)  — NOTE: torch stores ConvTranspose1d weight as
         (in, out, k); the checkpoint converter flips & transposes into this
         layout once at load time so the hot path has zero transposes.
      b: (C_out,) or None
    """
    k = w.shape[0]
    out = jax.lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=_DIMS,
        precision=precision,
    )
    if b is not None:
        out = out + b
    return out


def fold_weight_norm(g: jnp.ndarray, v: jnp.ndarray, dim_out_axis: int = -1) -> jnp.ndarray:
    """Fold torch weight_norm (g, v) into a plain kernel: w = g * v/||v||.

    torch computes the norm over all axes except the output-channel axis
    (dim=0 in torch layout).  Works on any layout given `dim_out_axis`.
    The reference folds at load time too (hifigan/models.py:199-206 via
    remove_weight_norm), so inference numerics are identical.
    """
    axes = tuple(i for i in range(v.ndim) if i != (dim_out_axis % v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm
