"""Monotonic Alignment Search as a Pallas TPU kernel — batched wavefront.

The reference's MAS is a Cython/OpenMP CPU kernel with a device↔host round
trip per training step (reference: monotonic_align/__init__.py:7-22,
core.pyx:11-47).  The lax.scan formulation (ops/mas.py) keeps it on device
but issues one XLA loop iteration per mel frame, each carrying visible
per-step overhead.

This kernel runs the whole DP for a BLOCK OF BATCH ITEMS inside one Pallas
program; two ideas make it fast:

1. **Batched wavefront** — one `fori_loop` step advances the column DP for
   all items at once on the VPU ((B_blk, T_x) per step: text positions on
   the lanes, items on the sublanes), so the sequential-step count is T_y,
   not B·T_y.

2. **Decision-bit backtrace** — the backtrace needs only the per-cell
   decision  D[x, y] = (x == y  or  V[x, y−1] < V[x−1, y−1]) and x ≠ 0,
   not the DP values.  The forward pass emits D rows as it goes, and the
   backtrace then updates a per-item ONE-HOT position vector with pure
   vector ops:  move = oh·D;  oh ← (oh − move) + shift_left(move)  — no
   scalar index, no one-hot reconstruction, no lane reductions.

VMEM budget: ONE buffer.  The kernel is gridless with
``input_output_aliases`` — the logp block is consumed in place: the forward
pass overwrites row y with decision bits right after reading it, and the
backtrace overwrites row y with the binary path after its final read.
B_blk = 16, T_x = 256, T_y = 768 → 12.6 MB, inside the 16 MB VMEM scoped
limit (a pipelined grid would double-buffer separate in/out blocks and blow
it).  Batches beyond B_blk chunk via a host-level python loop (B is static
under jit).

Layout: host transposes to (T_y, B, T_x) once so each DP step reads one
contiguous (items-on-sublanes × text-on-lanes) row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_NEG = -1e9
BATCH_BLOCK = 16  # one in-place (T_y, 16, T_x) f32 buffer ≈ 12.6 MB at T_x=256, T_y=768


def _mas_kernel(t_xs_ref, t_ys_ref, logp_ref, out_ref):
    """One batch block: logp (T_y, B_blk, T_x) → binary path, same shape.

    logp_ref and out_ref ALIAS the same VMEM buffer (input_output_aliases):
    forward overwrites each row with decision bits; backtrace overwrites
    each row with the path.  t_xs_ref/t_ys_ref: (B_blk, 1) int32 lengths.
    """
    t_y_max, b_blk, t_x_max = logp_ref.shape
    x_idx = jax.lax.broadcasted_iota(jnp.int32, (b_blk, t_x_max), 1)
    t_ys = t_ys_ref[...]  # (B_blk, 1)

    # ---- forward wavefront: all items advance one column per step --------
    def fwd(y, prev):
        lp = logp_ref[y]  # (B_blk, T_x)
        shifted = pltpu.roll(prev, 1, 1)  # prev[x-1] at lane x
        # decision bits for the backtrace (reference core.pyx:31-36):
        # step diagonally iff x == y or V[x, y-1] < V[x-1, y-1]; never at x=0
        dec = ((x_idx == y) | (prev < shifted)) & (x_idx != 0)
        v_cur = jnp.where(x_idx == y, MAX_NEG, prev)
        first = jnp.where(y == 0, 0.0, MAX_NEG)
        v_prev = jnp.where(x_idx == 0, first, shifted)
        new = lp + jnp.maximum(v_cur, v_prev)
        new = jnp.where(x_idx > y, MAX_NEG, new)
        out_ref[y] = dec.astype(jnp.float32)  # in place: lp row consumed
        return new

    init = jnp.full((b_blk, t_x_max), MAX_NEG, jnp.float32)
    jax.lax.fori_loop(0, t_y_max, fwd, init)

    # ---- one-hot backtrace: no scalar state, no reductions ---------------
    # oh starts at x = t_x-1 per item; rows at/above t_y are written 0 and
    # leave oh untouched.
    oh0 = (x_idx == t_xs_ref[...] - 1).astype(jnp.float32)  # (B_blk, T_x)

    def bwd(k, oh):
        y = t_y_max - 1 - k
        active = (y < t_ys).astype(jnp.float32)  # (B_blk, 1)
        dec_row = out_ref[y]  # decision bits (read BEFORE overwrite)
        out_ref[y] = oh * active
        move = oh * dec_row
        # circular left-shift by 1 (= roll by T_x-1; pltpu.roll wants shift ≥ 0);
        # wraparound is harmless: dec is forced 0 at x=0, so move[0] == 0
        oh_next = (oh - move) + pltpu.roll(move, t_x_max - 1, 1)
        return oh + (oh_next - oh) * active

    jax.lax.fori_loop(0, t_y_max, bwd, oh0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(value: jnp.ndarray, mask: jnp.ndarray, interpret: bool = False):
    """Batched MAS via the wavefront Pallas kernel.  Same contract as
    ops.mas.maximum_path: value/mask (B, T_x, T_y) → binary path."""
    dtype = value.dtype
    b, t_x_max, t_y_max = value.shape
    logp = (value.astype(jnp.float32) * mask.astype(jnp.float32))
    t_xs = jnp.sum(mask[:, :, 0], axis=-1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)

    pad_b = (-b) % BATCH_BLOCK
    if pad_b:
        logp = jnp.pad(logp, ((0, pad_b), (0, 0), (0, 0)))
        # zero-length pad items: oh starts at x = -1 (nowhere), never active
        t_xs = jnp.pad(t_xs, (0, pad_b))
        t_ys = jnp.pad(t_ys, (0, pad_b))
    bp = b + pad_b
    n_blocks = bp // BATCH_BLOCK

    logp_t = jnp.transpose(logp, (2, 0, 1))  # (T_y, B, T_x)

    call = pl.pallas_call(
        _mas_kernel,
        out_shape=jax.ShapeDtypeStruct((t_y_max, BATCH_BLOCK, t_x_max), jnp.float32),
        input_output_aliases={2: 0},  # logp block buffer becomes the path
        interpret=interpret,
    )
    # python loop over static batch chunks — each call owns ONE VMEM-resident
    # buffer; chunks run back-to-back without host sync
    outs = []
    for i in range(n_blocks):
        s = i * BATCH_BLOCK
        outs.append(call(
            t_xs[s:s + BATCH_BLOCK][:, None],
            t_ys[s:s + BATCH_BLOCK][:, None],
            logp_t[:, s:s + BATCH_BLOCK, :],
        ))
    out = outs[0] if n_blocks == 1 else jnp.concatenate(outs, axis=1)

    path = jnp.transpose(out, (1, 2, 0))[:b]  # (B, T_x, T_y)
    return (path * mask.astype(jnp.float32)).astype(dtype)
