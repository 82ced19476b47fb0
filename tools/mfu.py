"""MFU/roofline accounting for the three hot programs → docs/artifacts/mfu.json.

Closes the "perf is judged by RTF alone" gap: for (1) the fused synthesis
program (the bench.py path), (2) the training step at the flagship shape
(docs/artifacts/tpu_train_proof: batch 8, out_size 172), and (3) the HiFi-GAN
generator alone, report

  - FLOPs per execution from the COMPILER's own cost model
    (``jit(...).lower(...).compile().cost_analysis()``) — not hand counts;
  - per-call device time with the constant dispatch cost removed
    (tools/bench_util.amortized_ms two-depth slope — through this
    environment's tunnel a single dispatch carries ~3 ms of RTT that is NOT
    device time);
  - achieved TFLOP/s and percent of the chip's published bf16 peak
    (v5e: 197 TFLOP/s; CPU runs report achieved only).

All three programs here compute in f32 (measured faster than bf16 at this
model size — conv/overhead-bound, CLAUDE.md), so percent-of-bf16-peak is a
conservative lower bound on MXU efficiency.

Run: python tools/mfu.py [--cpu] [--out docs/artifacts/mfu.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_util import amortized_ms

PEAK_TFLOPS = {"TPU v5e": 197.0, "TPU v5 lite": 197.0, "TPU v4": 275.0,
               "TPU v6e": 918.0}

BENCH_TEXT = ("The quick brown fox jumped over the lazy dog, and everyone at "
              "the party cheered loudly for the brave little robot.")


def _flops_of(lowered) -> float:
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return float(cost.get("flops", float("nan")))


def _entry(name: str, flops: float, ms: float, peak_tflops) -> dict:
    achieved = flops / (ms * 1e-3) / 1e12 if ms > 0 else float("nan")
    e = {
        "program": name,
        "flops_per_call": flops,
        "gflops_per_call": round(flops / 1e9, 2),
        "device_ms_per_call": round(ms, 3),
        "achieved_tflops": round(achieved, 3),
    }
    if peak_tflops:
        e["peak_bf16_tflops"] = peak_tflops
        e["pct_of_bf16_peak"] = round(100.0 * achieved / peak_tflops, 2)
    return e


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--preset", default="emoji_multi",
                    help="flagship for the artifact; 'tiny' for CPU smoke")
    ap.add_argument("--out", default=None, help="write JSON here as well as stdout")
    ap.add_argument("--steps", type=int, default=10, help="CFM Euler steps (bench config)")
    ap.add_argument("--train_batch", type=int, default=8)
    ap.add_argument("--out_size", type=int, default=172)
    ap.add_argument("--voc_frames", type=int, default=512)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from emojivoice_tpu import config as cfglib
    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.utils.buckets import pick_bucket
    from emojivoice_tpu.utils.prng import host_prng_key

    enable_compilation_cache()
    dev = jax.devices()[0]
    device_kind = getattr(dev, "device_kind", "cpu")
    peak = next((v for k, v in PEAK_TFLOPS.items() if k.lower() in device_kind.lower()),
                None)
    entries = []

    root = cfglib.get_preset(args.preset)

    # ---- 1. fused synthesis program (exactly bench.py's measured path)
    pipe = SynthesisPipeline.from_random(root_cfg=root, cleaners=("basic_cleaners",))
    spk = min(79, root.model.n_spks - 1)  # 😎 in the emoji mapping (bench.py)
    first = pipe.synthesise([BENCH_TEXT], spks=[spk], n_timesteps=args.steps, seed=0,
                            keep_mel=False, pcm16=True)[0]
    m_bucket = pick_bucket(first.mel_length, pipe.mel_buckets)
    x, x_lengths, _, t_bucket = pipe.encode_texts([BENCH_TEXT])
    spk_arr = np.asarray([spk], np.int32)
    rng = host_prng_key(0)
    ls, temp, ds = np.float32(1.0), np.float32(0.667), np.float32(0.00025)
    fused = pipe._get_fused(t_bucket, m_bucket, 1, args.steps, True, False, True)
    fused_args = (pipe.params, pipe.vocoder_params, x, x_lengths, spk_arr, ls, temp, rng, ds)
    flops_syn = _flops_of(fused.lower(*fused_args))

    def syn_call(i, acc, *a):
        # perturb the PRNG key by the loop index so XLA cannot hoist the body
        a = list(a)
        a[7] = (a[7] + jnp.uint32(i)).astype(jnp.uint32)
        out = fused(*a)
        return out["wav"].astype(jnp.float32)

    ms_syn = amortized_ms(syn_call, fused_args)
    entries.append(_entry(
        f"fused_synthesis_b1_t{t_bucket}_m{m_bucket}_{args.steps}steps",
        flops_syn, ms_syn, peak))

    # ---- 2. training step at the flagship committed shape
    from emojivoice_tpu.training.state import (
        create_train_state, make_train_multi_step, make_train_step)

    import dataclasses as _dc

    model_cfg = _dc.replace(root.model, out_size=args.out_size)
    state = create_train_state(model_cfg, root.optimizer, seed=0)
    b, tx_len, ty_len = args.train_batch, 96, 384  # tpu_train_proof bucket shape
    rng_np = np.random.default_rng(0)
    batch = {
        "x": rng_np.integers(1, 170, (b, tx_len)).astype(np.int32),
        "x_lengths": np.full((b,), tx_len, np.int32),
        "y": rng_np.normal(size=(b, ty_len, model_cfg.n_feats)).astype(np.float32),
        "y_lengths": np.full((b,), ty_len, np.int32),
        "spks": rng_np.integers(0, model_cfg.n_spks, (b,)).astype(np.int32),
    }
    key = jax.random.PRNGKey(0)
    step1 = make_train_step(model_cfg, root.optimizer)
    flops_train = _flops_of(step1.lower(state, batch, key))
    # timing via the K-step scan program (state threads through the scan, so
    # the two-depth slope is honest device time per optimizer step)
    multi = {n: make_train_multi_step(model_cfg, root.optimizer) for n in (1, 8)}
    from bench_util import time_median

    def run_k(n):
        stacked = {k: np.broadcast_to(v, (n,) + v.shape).copy() for k, v in batch.items()}
        mask = np.ones((n,), np.float32)
        # the multi-step program DONATES the state — always rebind it to the
        # returned one, including on the compile call
        st = create_train_state(model_cfg, root.optimizer, seed=0)
        st, _ = multi[n](st, stacked, key, mask)  # compile

        def once():
            nonlocal st
            st, m = multi[n](st, stacked, key, mask)
            float(jnp.sum(m["loss"]))  # force full completion
        return time_median(once, n=5)

    t1, t8 = run_k(1), run_k(8)
    ms_train = (t8 - t1) / 7.0
    entries.append(_entry(
        f"train_step_b{b}_tx{tx_len}_ty{ty_len}_outsize{args.out_size}",
        flops_train, ms_train, peak))

    # ---- 3. HiFi-GAN generator alone at serving shape
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    voc = HiFiGANGenerator(cfg=root.vocoder)
    mel = np.asarray(rng_np.normal(size=(1, args.voc_frames, root.vocoder.num_mels)),
                     np.float32)
    voc_params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, root.vocoder.num_mels)))
    voc_fn = jax.jit(voc.apply)
    flops_voc = _flops_of(voc_fn.lower(voc_params, mel))

    def voc_call(i, acc, p, m):
        return voc_fn(p, m + (jnp.float32(i) * 1e-6))

    ms_voc = amortized_ms(voc_call, (voc_params, mel))
    entries.append(_entry(f"hifigan_b1_t{args.voc_frames}", flops_voc, ms_voc, peak))

    report = {
        "device_kind": device_kind,
        "backend": jax.default_backend(),
        "jax": jax.__version__,
        "compute_dtype": "float32",
        "note": ("FLOPs from XLA cost_analysis; per-call ms is the two-depth "
                 "loop slope (dispatch/tunnel RTT removed); percent of the "
                 "published bf16 MXU peak — f32 programs, so this is a "
                 "conservative lower bound"),
        "programs": entries,
    }
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
