"""Monotonic Alignment Search — TPU-native.

The reference implements MAS as a Cython/OpenMP CPU kernel and pays a
device→host→device round trip **every training step**
(reference: Matcha-TTS/matcha/utils/monotonic_align/__init__.py:7-22 moves
tensors to CPU numpy; core.pyx:11-47 runs the DP with `prange` over batch).

Here the same Viterbi-style DP runs *on device* as a column-wavefront
`lax.scan`: each scan step processes one mel-frame column with a vectorized
update over all text positions, then a reverse scan reconstructs the
argmax path.  Batch items are vmapped.  Exactly reproduces the Cython
recurrence, including its boundary rules:

  value[x, y] += max(v_cur, v_prev)
    v_cur  = value[x, y-1]    (or -inf when x == y)
    v_prev = value[x-1, y-1]  (x == 0: 0 at y == 0, else -inf)

and the backtrace `index -= (index == y) or value[index, y-1] < value[index-1, y-1]`.

An alternative host backend (`backend="cpp"`) calls the C++/OpenMP kernel in
ops/cpp via jax.pure_callback for CPU-bound environments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_NEG = -1e9


def _forward_scan(logp: jnp.ndarray, t_y: jnp.ndarray) -> jnp.ndarray:
    """Cumulative DP values, single item.  logp: (T_x, T_y) → value (T_x, T_y)."""
    t_x_max = logp.shape[0]
    x_idx = jnp.arange(t_x_max)

    def step(prev_col, inputs):
        y, lp_col = inputs
        v_cur = jnp.where(x_idx == y, MAX_NEG, prev_col)
        first = jnp.where(y == 0, 0.0, MAX_NEG)
        v_prev = jnp.concatenate([jnp.asarray([0.0], logp.dtype), prev_col[:-1]])
        v_prev = v_prev.at[0].set(first)
        new_col = lp_col + jnp.maximum(v_cur, v_prev)
        new_col = jnp.where(x_idx > y, MAX_NEG, new_col)
        return new_col, new_col

    ys = jnp.arange(logp.shape[1])
    # unroll: the per-frame body is tiny vector work; loop overhead dominates
    _, cols = jax.lax.scan(step, jnp.full((t_x_max,), MAX_NEG, logp.dtype), (ys, logp.T),
                           unroll=8)
    return cols.T  # (T_x, T_y)


def _backtrace_scan(value: jnp.ndarray, t_x: jnp.ndarray, t_y: jnp.ndarray) -> jnp.ndarray:
    """Reverse argmax walk, single item → binary path (T_x, T_y)."""
    t_x_max, t_y_max = value.shape
    x_idx = jnp.arange(t_x_max)

    # prev_cols[y] = value[:, y-1]; y = 0 never reads it (index==0 short-circuits).
    prev_cols = jnp.concatenate([jnp.zeros((t_x_max, 1), value.dtype), value[:, :-1]], axis=1)

    def step(index, inputs):
        y, prev_col = inputs
        active = y < t_y
        row = jnp.where(active, (x_idx == index).astype(value.dtype), 0.0)
        v_same = prev_col[index]
        v_prev = prev_col[jnp.maximum(index - 1, 0)]
        dec = active & (index != 0) & ((index == y) | (v_same < v_prev))
        return jnp.where(dec, index - 1, index), row

    ys = jnp.arange(t_y_max - 1, -1, -1)
    _, rows = jax.lax.scan(step, t_x - 1, (ys, prev_cols[:, ys].T), unroll=8)
    return rows[::-1].T  # (T_x, T_y)


def resolve_backend(shape) -> str:
    """Backend for backend="auto" at a given (B, T_x, T_y) shape.

    The Pallas kernel holds ONE (T_y, 16, T_x) f32 block in VMEM
    (ops/mas_pallas.py); beyond the proven budget (12.6 MB = the
    T_x=256 × T_y=768 training config) Mosaic would fail to allocate at
    compile time mid-training, so larger buckets fall back to the scan
    formulation, which has no shape ceiling.
    """
    from emojivoice_tpu.ops.mas_pallas import BATCH_BLOCK

    _, t_x, t_y = shape
    fits = t_y * BATCH_BLOCK * t_x * 4 <= 768 * 16 * 256 * 4
    return "pallas" if (jax.default_backend() == "tpu" and fits) else "jax"


@functools.partial(jax.jit, static_argnames=("backend",))
def maximum_path(value: jnp.ndarray, mask: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Batched MAS: most-likely monotone path through a log-prior.

    Args:
      value: (B, T_x, T_y) log-prior (higher = more likely).
      mask:  (B, T_x, T_y) attention mask; lengths are derived from it the
             same way as the reference wrapper (monotonic_align/__init__.py:15-21).
      backend: "auto" picks the batched-wavefront Pallas kernel on TPU
             (measured 2.3× the scan at B=16, T_x=256, T_y=768 on v5e —
             tools/bench_mas.py) and the lax.scan formulation elsewhere;
             "jax" | "pallas" | "pallas_interpret" | "cpp" force one.
    Returns binary path of the same shape/dtype as `value`.
    """
    if backend == "auto":
        backend = resolve_backend(value.shape)
    if backend == "cpp":
        from emojivoice_tpu.ops.mas_cpp import maximum_path_cpp

        return maximum_path_cpp(value, mask)
    if backend in ("pallas", "pallas_interpret"):
        from emojivoice_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(value, mask, interpret=backend == "pallas_interpret")

    dtype = value.dtype
    value = value.astype(jnp.float32) * mask.astype(jnp.float32)
    t_xs = jnp.sum(mask[:, :, 0], axis=-1).astype(jnp.int32)
    t_ys = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)

    def one(v, tx, ty):
        cum = _forward_scan(v, ty)
        return _backtrace_scan(cum, tx, ty)

    path = jax.vmap(one)(value, t_xs, t_ys)
    return (path * mask.astype(jnp.float32)).astype(dtype)


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Brute-force O(T_x·T_y) numpy oracle used by tests (independent of the
    scan formulation): explicit DP table + backtrace."""
    b = value.shape[0]
    out = np.zeros_like(value)
    for i in range(b):
        t_x = int(mask[i, :, 0].sum())
        t_y = int(mask[i, 0, :].sum())
        v = value[i, :t_x, :t_y].astype(np.float64).copy()
        dp = np.full((t_x, t_y), -np.inf)
        dp[0, 0] = v[0, 0]
        for y in range(1, t_y):
            for x in range(min(t_x, y + 1)):
                best = dp[x, y - 1] if x != y else -np.inf
                if x > 0:
                    best = max(best, dp[x - 1, y - 1])
                dp[x, y] = v[x, y] + best
        x = t_x - 1
        for y in range(t_y - 1, -1, -1):
            out[i, x, y] = 1.0
            if x != 0 and (x == y or dp[x, y - 1] < dp[x - 1, y - 1]):
                x -= 1
    return out
