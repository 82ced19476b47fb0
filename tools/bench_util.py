"""Shared timing helpers for the bench tools.

`amortized_ms` is the unbiased per-call method: jit a fori_loop of the op at
two depths and take the slope (t_hi - t_1) / (n_hi - 1).  This cancels the
constant per-dispatch cost (the tunneled TPU's ~3 ms round trip would
otherwise inflate every reported stage time by a constant), unlike dividing
one dispatch's wall time by the loop depth.  Each loop iteration perturbs the
input by i-dependent epsilon and folds a strided sum into the carry so XLA
can't hoist or elide the body.
"""

from __future__ import annotations

import datetime as _dt


def time_median(fn, n: int = 5) -> float:
    """Median wall-clock ms of `fn()` over n calls (call must block)."""
    import numpy as np

    ts = []
    for _ in range(n):
        t0 = _dt.datetime.now()
        fn()
        ts.append((_dt.datetime.now() - t0).total_seconds() * 1e3)
    return float(np.median(ts))


def amortized_ms(make_call, warm_args, n_hi: int = 8, stride: int = 4096,
                 _retries: int = 2) -> float:
    """Per-call ms of `make_call(i, acc, *args) -> array`, dispatch cost removed.

    make_call receives the loop index i (f32-castable), the running carry acc,
    and warm_args; it must return an array whose strided sum is folded into
    the carry.  Returns (median wall of n_hi-deep loop - median wall of 1-deep
    loop) / (n_hi - 1).

    For programs whose per-call time is small against dispatch jitter the
    slope can come out ≤ 0; the measurement then escalates the loop depth
    16× (up to twice: 8 → 128 → 2048) until per-call signal ≫ jitter.
    """
    import jax
    import jax.numpy as jnp

    def make_rep(n):
        @jax.jit
        def rep(*args):
            def body(i, acc):
                out = make_call(i, acc, *args)
                return acc + jnp.sum(out[..., ::stride].astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return rep

    rep1, rep_hi = make_rep(1), make_rep(n_hi)
    _ = float(rep1(*warm_args))
    _ = float(rep_hi(*warm_args))
    t1 = time_median(lambda: float(rep1(*warm_args)))
    th = time_median(lambda: float(rep_hi(*warm_args)))
    ms = (th - t1) / (n_hi - 1)
    if ms <= 0 and _retries > 0:
        return amortized_ms(make_call, warm_args, n_hi=n_hi * 16, stride=stride,
                            _retries=_retries - 1)
    return ms
