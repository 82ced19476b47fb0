"""Train-step benchmark on the real TPU: f32 vs bf16-mixed.

Flagship (emoji_multi) model at training shapes, full jitted step (encoder +
on-device MAS + CFM loss + backward + Adam).  Per-precision: compile, then
median of N timed steps, each fully blocked via a scalar fetch.

Usage: python tools/bench_train.py [--b 16 --tx 128 --ty 512 --out_size 172 --iters 10]
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
    p.add_argument("--tx", type=int, default=128)
    p.add_argument("--ty", type=int, default=512)
    p.add_argument("--out_size", type=int, default=172)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--precisions", default="f32,bf16-mixed")
    p.add_argument("--steps_per_dispatch", type=int, default=0,
                   help="also bench K steps per compiled dispatch (lax.scan)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emojivoice_tpu.config import OptimizerConfig, enable_compilation_cache, get_preset
    from emojivoice_tpu.training import create_train_state, make_train_step

    enable_compilation_cache()
    print(f"[bench_train] backend={jax.default_backend()} "
          f"shape=B{args.b} Tx{args.tx} Ty{args.ty} out_size={args.out_size}", file=sys.stderr)

    cfg = dataclasses.replace(get_preset("emoji_multi").model, out_size=args.out_size)
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, 170, size=(args.b, args.tx)), jnp.int32),
        "x_lengths": jnp.asarray(rng.integers(args.tx // 2, args.tx + 1, (args.b,)), jnp.int32),
        "y": jnp.asarray(rng.normal(size=(args.b, args.ty, cfg.n_feats)).astype(np.float32)),
        "y_lengths": jnp.asarray(rng.integers(args.ty // 2, args.ty + 1, (args.b,)), jnp.int32),
        "spks": jnp.asarray(rng.integers(0, cfg.n_spks, size=(args.b,)), jnp.int32),
    }

    results = {}
    for precision in args.precisions.split(","):
        state = create_train_state(cfg, OptimizerConfig(), seed=0)
        step = make_train_step(cfg, OptimizerConfig(), precision=precision)
        t0 = dt.datetime.now()
        state, m = step(state, batch, jax.random.PRNGKey(0))
        loss0 = float(m["loss"])  # blocks
        compile_s = (dt.datetime.now() - t0).total_seconds()

        from emojivoice_tpu.utils.prng import host_prng_key

        times = []
        for i in range(args.iters):
            t0 = dt.datetime.now()
            # host-built key: an eager jax.random.PRNGKey here is its own
            # synchronous tunnel round trip per step
            state, m = step(state, batch, host_prng_key(i + 1))
            _ = float(m["loss"])
            times.append((dt.datetime.now() - t0).total_seconds())
        ms = float(np.median(times)) * 1e3
        results[precision] = ms
        print(json.dumps({
            "metric": f"train_step_{precision}_ms", "value": round(ms, 2), "unit": "ms",
            "loss0": round(loss0, 4), "compile_s": round(compile_s, 1),
            "shape": [args.b, args.tx, args.ty],
        }))

        # pipelined throughput: dispatch a run of steps without per-step
        # fetches (the train loop's steady state — it syncs only every
        # log_every steps), so device compute overlaps the dispatch RTT.
        # On a remote TPU this is the number that matters: the blocked
        # per-step figure above pays a full tunnel round trip per step.
        t0 = dt.datetime.now()
        for i in range(args.iters):
            state, m = step(state, batch, host_prng_key(1000 + i))
        _ = float(m["loss"])  # one sync at the end of the run
        pipelined_ms = (dt.datetime.now() - t0).total_seconds() * 1e3 / args.iters
        print(json.dumps({
            "metric": f"train_step_{precision}_pipelined_ms",
            "value": round(pipelined_ms, 2), "unit": "ms",
            "steps_per_s": round(1e3 / pipelined_ms, 2),
        }))

        if args.steps_per_dispatch > 1:
            # K steps per compiled dispatch (lax.scan), FRESH numpy chunk per
            # dispatch — the real train-loop case, where each dispatch also
            # carries its batch data through the tunnel.  Amortizes the
            # round trip over K optimizer steps (--steps_per_dispatch in the
            # train CLI).
            from emojivoice_tpu.training import make_train_multi_step

            k = args.steps_per_dispatch
            multi = make_train_multi_step(cfg, OptimizerConfig(), precision=precision)
            state = create_train_state(cfg, OptimizerConfig(), seed=0)
            def chunk_of(i):
                r = np.random.default_rng(i)
                return {
                    "x": r.integers(1, 170, size=(k, args.b, args.tx)).astype(np.int32),
                    "x_lengths": r.integers(args.tx // 2, args.tx + 1, (k, args.b)).astype(np.int32),
                    "y": r.normal(size=(k, args.b, args.ty, cfg.n_feats)).astype(np.float32),
                    "y_lengths": r.integers(args.ty // 2, args.ty + 1, (k, args.b)).astype(np.int32),
                    "spks": r.integers(0, cfg.n_spks, size=(k, args.b)).astype(np.int32),
                }
            mask = np.ones((k,), np.float32)
            t0 = dt.datetime.now()
            state, m = multi(state, chunk_of(0), host_prng_key(0), mask)
            _ = float(np.sum(np.asarray(m["loss"])))
            scan_compile_s = (dt.datetime.now() - t0).total_seconds()
            n_chunks = max(1, args.iters // k)
            chunks = [chunk_of(i + 1) for i in range(n_chunks)]  # pre-gen: host cost excluded
            t0 = dt.datetime.now()
            for i in range(n_chunks):
                state, m = multi(state, chunks[i], host_prng_key(2000 + i), mask)
            _ = float(np.sum(np.asarray(m["loss"])))
            chunk_ms = (dt.datetime.now() - t0).total_seconds() * 1e3 / (n_chunks * k)
            print(json.dumps({
                "metric": f"train_step_{precision}_k{k}_ms",
                "value": round(chunk_ms, 2), "unit": "ms",
                "steps_per_s": round(1e3 / chunk_ms, 2),
                "scan_compile_s": round(scan_compile_s, 1),
            }))

    ks = list(results)
    if len(ks) == 2:
        print(json.dumps({"metric": "bf16_speedup",
                          "value": round(results[ks[0]] / results[ks[1]], 2), "unit": "x"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
