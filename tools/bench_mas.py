"""MAS backend benchmark at training shapes (real TPU).

Times the scan backend vs the batched-wavefront Pallas kernel at the
training workload (B=16, T_x=256, T_y=768 by default).  Each measurement
runs N serialized repetitions INSIDE one jitted program (carry-dependent,
so XLA cannot CSE them) to amortize the ~28 ms tunnel round trip, then
fetches a scalar (block_until_ready alone can return early on axon).

Usage: python tools/bench_mas.py [--b 16 --tx 256 --ty 768 --reps 8 --iters 5]
Prints one JSON line per backend.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=16)
    p.add_argument("--tx", type=int, default=256)
    p.add_argument("--ty", type=int, default=768)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--backends", default="jax,pallas")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.ops.mas import maximum_path, maximum_path_numpy

    enable_compilation_cache()
    print(f"[bench_mas] backend={jax.default_backend()} shape=({args.b},{args.tx},{args.ty})",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    t_xs = rng.integers(args.tx // 2, args.tx + 1, size=args.b)
    t_ys = rng.integers(args.ty // 2, args.ty + 1, size=args.b)
    value = rng.normal(size=(args.b, args.tx, args.ty)).astype(np.float32)
    mask = np.zeros_like(value)
    for i in range(args.b):
        mask[i, : t_xs[i], : t_ys[i]] = 1.0
    v, m = jnp.asarray(value), jnp.asarray(mask)

    # correctness cross-check once per backend against the brute-force oracle
    want = maximum_path_numpy(value * mask, mask)

    results = {}
    for backend in args.backends.split(","):
        got = np.asarray(maximum_path(v, m, backend=backend))
        np.testing.assert_array_equal(got, want)

        @jax.jit
        def rep(v, m, backend=backend):
            def body(c, _):
                path = maximum_path(v + c * 0, m, backend=backend)
                return jnp.sum(path), None

            s, _ = jax.lax.scan(body, jnp.float32(0), None, length=args.reps)
            return s

        t0 = dt.datetime.now()
        float(rep(v, m))  # compile + first run
        compile_s = (dt.datetime.now() - t0).total_seconds()

        times = []
        for _ in range(args.iters):
            t0 = dt.datetime.now()
            float(rep(v, m))
            times.append((dt.datetime.now() - t0).total_seconds())
        per_call_ms = float(np.median(times)) / args.reps * 1e3
        results[backend] = per_call_ms
        print(json.dumps({
            "metric": f"mas_{backend}_ms", "value": round(per_call_ms, 3), "unit": "ms",
            "shape": [args.b, args.tx, args.ty], "compile_s": round(compile_s, 1),
        }))

    if "jax" in results and "pallas" in results:
        print(json.dumps({"metric": "mas_pallas_speedup",
                          "value": round(results["jax"] / results["pallas"], 2), "unit": "x"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
