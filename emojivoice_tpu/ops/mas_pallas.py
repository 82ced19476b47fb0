"""Monotonic Alignment Search as a Pallas TPU kernel.

The lax.scan formulation (ops/mas.py) issues one XLA loop step per mel
frame — thousands of tiny sequential steps with loop overhead.  This kernel
runs the whole DP *inside* one Pallas program per batch item (grid over
batch): the cumulative-value matrix lives in VMEM ((T_y, T_x) ≤
2048×512×4B = 4 MB), the column wavefront is a vectorized VPU update, and
the backtrace reads rows via one-hot contractions — no per-step dispatch.

Layout note: the matrix is stored (T_y, T_x) so each DP step touches one
contiguous row (text positions ride the lanes).

Per-item lengths arrive via scalar prefetch (t_xs, t_ys) so the kernel can
mask its loops before the body runs.  Falls back to interpret mode off-TPU
(tests), and `maximum_path(backend=...)` in ops/mas.py selects between
"jax" | "pallas" | "cpp".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_NEG = -1e9


def _mas_kernel(t_xs_ref, t_ys_ref, logp_ref, path_ref, cum_ref):
    """One batch item: logp (T_y, T_x) → binary path (T_y, T_x).

    cum_ref: VMEM scratch (T_y, T_x) for the DP values.
    """
    i = pl.program_id(0)
    t_x = t_xs_ref[i]
    t_y = t_ys_ref[i]
    t_y_max, t_x_max = logp_ref.shape
    # Mosaic vectors must be ≥2D: work in (1, T_x) rows throughout
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_x_max), 1)

    # ---- forward wavefront ------------------------------------------------
    def fwd(y, prev_col):
        lp = logp_ref[pl.ds(y, 1), :]  # (1, T_x)
        v_cur = jnp.where(x_idx == y, MAX_NEG, prev_col)
        shifted = pltpu.roll(prev_col, 1, 1)
        first = jnp.where(y == 0, 0.0, MAX_NEG)
        v_prev = jnp.where(x_idx == 0, first, shifted)
        new_col = lp + jnp.maximum(v_cur, v_prev)
        new_col = jnp.where(x_idx > y, MAX_NEG, new_col)
        cum_ref[pl.ds(y, 1), :] = new_col
        return new_col

    init = jnp.full((1, t_x_max), MAX_NEG, jnp.float32)
    jax.lax.fori_loop(0, t_y_max, fwd, init)

    # ---- backtrace --------------------------------------------------------
    path_ref[...] = jnp.zeros_like(path_ref)

    def bwd(k, index):
        y = t_y_max - 1 - k
        active = y < t_y
        onehot = (x_idx == index).astype(jnp.float32)  # (1, T_x)

        @pl.when(active)
        def _():
            path_ref[pl.ds(y, 1), :] = onehot

        prev_row = cum_ref[pl.ds(jnp.maximum(y - 1, 0), 1), :]  # (1, T_x)
        v_same = jnp.sum(prev_row * onehot)
        v_prev = jnp.sum(prev_row * (x_idx == index - 1).astype(jnp.float32))
        dec = active & (index != 0) & ((index == y) | (v_same < v_prev))
        return jnp.where(dec, index - 1, index)

    jax.lax.fori_loop(0, t_y_max, bwd, t_x - 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched MAS via the Pallas kernel; same contract as ops.mas.maximum_path."""
    dtype = value.dtype
    b, t_x_max, t_y_max = value.shape
    v = (value.astype(jnp.float32) * mask.astype(jnp.float32)).transpose(0, 2, 1)  # (B, TY, TX)
    t_xs = jnp.sum(mask[:, :, 0], axis=-1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t_y_max, t_x_max), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, t_y_max, t_x_max), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((t_y_max, t_x_max), jnp.float32)],
    )
    path = pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t_y_max, t_x_max), jnp.float32),
        interpret=interpret,
    )(t_xs, t_ys, v)
    path = path.transpose(0, 2, 1)
    return (path * mask.astype(jnp.float32)).astype(dtype)
