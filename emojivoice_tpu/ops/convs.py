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


def conv_transpose1d_subpixel(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    precision=None,
) -> jnp.ndarray:
    """conv_transpose1d via phase decomposition (sub-pixel / depth-to-space).

    Identical output to :func:`conv_transpose1d`, different lowering: instead
    of an input-dilated conv (XLA materializes the stride-1 zero lattice),
    compute one dense conv producing ``stride·C_out`` channels and interleave
    phases by reshape.  For upsampling convs (HiFi-GAN's k=16,s=8 stages)
    this turns a mostly-zero convolution into a dense MXU matmul.

    Derivation: y[m] = Σ_d x[t₀−d]·W[r+d·s] with u=m+padding, r=u mod s,
    t₀=⌊u/s⌋ — i.e. per output phase r a small conv over x with kernel taps
    W[r::s], then y[u]=z[t₀, phase r], trimmed by `padding`.
    """
    k, cin, cout = w.shape
    s = stride
    n = -(-k // s)  # taps per phase
    t = x.shape[1]
    out_len = (t - 1) * s - 2 * padding + k

    # phase kernels: K[d, :, r·cout:(r+1)·cout] = W[r + d·s]
    kr = jnp.zeros((n, cin, s * cout), w.dtype)
    for r in range(s):
        taps = w[r::s]  # (n_r, cin, cout)
        kr = kr.at[: taps.shape[0], :, r * cout : (r + 1) * cout].set(taps)
    kr = jnp.flip(kr, axis=0)  # so a plain conv computes Σ_d x[t₀−d]·K[d]

    x_pad = jnp.pad(x, ((0, 0), (n - 1, n), (0, 0)))
    z = jax.lax.conv_general_dilated(
        x_pad, kr, window_strides=(1,), padding=[(0, 0)],
        dimension_numbers=_DIMS, precision=precision,
    )  # (B, T+n, s·cout)
    y = z.reshape(z.shape[0], -1, cout)[:, padding : padding + out_len]
    if b is not None:
        y = y + b
    return y


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
