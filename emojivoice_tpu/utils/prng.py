"""Host-side PRNG key construction (serving-latency optimization)."""

from __future__ import annotations

import numpy as np


def host_prng_key(seed: int) -> np.ndarray:
    """jax.random.PRNGKey(seed) built on the host, no device op.

    ``jax.random.PRNGKey`` eagerly materializes the key on the device — over
    a remote-TPU tunnel that is a synchronous round trip per call.  The
    threefry key for an int seed is just the two 32-bit halves; constructing
    it as numpy lets the runtime bundle the transfer with the next dispatch
    instead.  Bit-equality with jax.random.PRNGKey is pinned in
    tests/test_utils.py (same key → same noise stream → same audio).
    """
    import jax

    seed = int(seed)
    # PRNGKey truncates the seed to 32 bits unless jax_enable_x64 is set;
    # replicate exactly so noise streams match.
    hi = (seed >> 32) & 0xFFFFFFFF if jax.config.jax_enable_x64 else 0
    return np.array([hi, seed & 0xFFFFFFFF], dtype=np.uint32)
