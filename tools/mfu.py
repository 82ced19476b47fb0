"""MFU/roofline accounting for the hot programs → docs/artifacts/mfu.json.

Closes the "perf is judged by RTF alone" gap.  Three layers of evidence:

1. **Whole-program MFU** for (a) the fused synthesis program (the bench.py
   path), (b) the training step at the flagship shape, (c) the HiFi-GAN
   generator alone: FLOPs and bytes from the COMPILER's own cost model
   (``jit(...).lower(...).compile().cost_analysis()``), per-call device time
   with the constant dispatch cost removed (tools/bench_util.amortized_ms
   two-depth slope — a tunneled dispatch carries ~3 ms RTT that is NOT
   device time), achieved TFLOP/s and percent of the chip's published bf16
   peak.

2. **Per-stage roofline** (``stages`` section): the fused synthesis program
   split at its architectural seams — text encoder / alignment+Euler×U-Net
   decode / HiFi-GAN / denoiser — each with FLOPs, bytes accessed,
   arithmetic intensity, achieved TFLOP/s AND GB/s, and a bound
   classification against the chip roofline (memory-bound when intensity <
   ridge = peak_flops/peak_bw).  This answers "is the 7.7% MFU left on the
   table or memory-bound?" per stage, not per anecdote.

3. **Precision sweep** (``precision_sweep`` section): the same fused
   program under per-stage mixed-precision variants (vocoder-only bf16,
   whole-graph bf16, XLA-vs-Pallas vocoder; the two-stage decoder-bf16
   split that keeps the encoder+duration math f32).  Noise is always drawn
   in f32 and duration math stays f32 in every variant (model invariants).

Run: python tools/mfu.py [--cpu] [--out docs/artifacts/mfu.json]
     [--skip_sweep] [--skip_train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench_util import amortized_ms, time_median

# published chip peaks: dense bf16 MXU TFLOP/s and HBM GB/s
PEAK_TFLOPS = {"TPU v5e": 197.0, "TPU v5 lite": 197.0, "TPU v4": 275.0,
               "TPU v6e": 918.0}
PEAK_GBPS = {"TPU v5e": 819.0, "TPU v5 lite": 819.0, "TPU v4": 1228.0,
             "TPU v6e": 1640.0}

BENCH_TEXT = ("The quick brown fox jumped over the lazy dog, and everyone at "
              "the party cheered loudly for the brave little robot.")


def _cost_of(lowered):
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    return (float(cost.get("flops", float("nan"))),
            float(cost.get("bytes accessed", float("nan"))))


def _entry(name: str, flops: float, ms: float, peak_tflops,
           bytes_accessed: float = float("nan"), peak_gbps=None) -> dict:
    achieved = flops / (ms * 1e-3) / 1e12 if ms > 0 else float("nan")
    e = {
        "program": name,
        "flops_per_call": flops,
        "gflops_per_call": round(flops / 1e9, 2),
        "device_ms_per_call": round(ms, 3),
        "achieved_tflops": round(achieved, 3),
    }
    if np.isfinite(bytes_accessed):
        gbps = bytes_accessed / (ms * 1e-3) / 1e9 if ms > 0 else float("nan")
        e["bytes_per_call"] = bytes_accessed
        e["mbytes_per_call"] = round(bytes_accessed / 1e6, 2)
        e["achieved_gbps"] = round(gbps, 1)
        e["arith_intensity_flop_per_byte"] = round(flops / bytes_accessed, 2)
    if peak_tflops:
        e["peak_bf16_tflops"] = peak_tflops
        e["pct_of_bf16_peak"] = round(100.0 * achieved / peak_tflops, 2)
    if peak_tflops and peak_gbps and np.isfinite(bytes_accessed):
        # roofline: the ceiling at this program's intensity is
        # min(peak_flops, intensity * peak_bw); ridge = peak_flops / peak_bw
        intensity = flops / bytes_accessed
        ridge = peak_tflops * 1e12 / (peak_gbps * 1e9)
        ceiling_tflops = min(peak_tflops, intensity * peak_gbps * 1e-3)
        e["roofline_bound"] = "memory" if intensity < ridge else "compute"
        e["ridge_intensity"] = round(ridge, 1)
        e["roofline_ceiling_tflops"] = round(ceiling_tflops, 2)
        e["pct_of_roofline_ceiling"] = round(100.0 * achieved / ceiling_tflops, 2)
        e["pct_of_hbm_peak"] = round(100.0 * e["achieved_gbps"] / peak_gbps, 2)
    return e


def _add_true_flops(entry: dict, true_flops: float, peak_tflops) -> dict:
    """XLA's cost model does NOT count FLOPs inside Pallas custom calls, so
    a program with fused Pallas kernels understates its work (and its MFU).
    ``true_flops`` comes from lowering the SAME computation with the
    XLA-conv backend; the *_true fields are the honest utilization."""
    ms = entry["device_ms_per_call"]
    achieved = true_flops / (ms * 1e-3) / 1e12 if ms > 0 else float("nan")
    entry["flops_xla_equiv"] = true_flops
    entry["gflops_xla_equiv"] = round(true_flops / 1e9, 2)
    entry["achieved_tflops_true"] = round(achieved, 3)
    if peak_tflops:
        entry["pct_of_bf16_peak_true"] = round(100.0 * achieved / peak_tflops, 2)
    return entry


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
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--skip_sweep", action="store_true")
    ap.add_argument("--skip_stages", action="store_true")
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
    peak_bw = next((v for k, v in PEAK_GBPS.items() if k.lower() in device_kind.lower()),
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
    flops_syn, bytes_syn = _cost_of(fused.lower(*fused_args))

    def syn_call(i, acc, *a):
        # perturb the PRNG key by the loop index so XLA cannot hoist the body
        a = list(a)
        a[7] = (a[7] + jnp.uint32(i)).astype(jnp.uint32)
        out = fused(*a)
        return out["wav"].astype(jnp.float32)

    ms_syn = amortized_ms(syn_call, fused_args)
    syn_entry = _entry(
        f"fused_synthesis_b1_t{t_bucket}_m{m_bucket}_{args.steps}steps",
        flops_syn, ms_syn, peak, bytes_syn, peak_bw)
    # Pallas custom calls are FLOP-opaque to cost_analysis: when the fused
    # program uses the Pallas MRF vocoder, lower the identical computation
    # with the XLA-conv backend to count the true work (the honest MFU)
    pipe_xla = None
    if pipe._pallas_voc:
        pipe_xla = SynthesisPipeline(root.model, pipe.params, root.vocoder,
                                     pipe.vocoder_params,
                                     cleaners=("basic_cleaners",),
                                     vocoder_backend="xla")
        fused_xla = pipe_xla._get_fused(t_bucket, m_bucket, 1, args.steps, True, False, True)
        true_flops_syn, _ = _cost_of(fused_xla.lower(*fused_args))
        _add_true_flops(syn_entry, true_flops_syn, peak)
    entries.append(syn_entry)

    # ---- 1b. per-stage roofline of the same path (VERDICT r5 directive #1):
    # encoder (stage A) / alignment+Euler decode (stage B, no vocoder) /
    # HiFi-GAN / denoiser, each as its own compiled program at the same
    # buckets.  Stage times don't sum exactly to the fused program (fusion
    # across seams is the point of fusing) — the cross-check ratio is
    # reported.
    stage_entries = []
    if not args.skip_stages:
        # encoder + duration head
        stage_a = pipe._get_stage_a(t_bucket, 1)
        a_args = (pipe.params, x, x_lengths, spk_arr, ls)
        flops_a, bytes_a = _cost_of(stage_a.lower(*a_args))

        def enc_call(i, acc, p, xx, xl, sp, l):
            out = stage_a(p, xx, xl, sp, l + jnp.float32(i) * 1e-9)
            return out[0].astype(jnp.float32)

        ms_a = amortized_ms(enc_call, a_args)
        stage_entries.append(_entry(
            f"encoder_b1_t{t_bucket}", flops_a, ms_a, peak, bytes_a, peak_bw))

        # alignment expansion + unrolled Euler U-Net (no vocoder, keep mel)
        mu_x, w_ceil, y_lengths, x_mask, spk_e = [
            np.asarray(v) if v is not None else None
            for v in jax.device_get(stage_a(*a_args))]
        stage_b = pipe._get_stage_b(t_bucket, m_bucket, 1, args.steps,
                                    denoise=False, keep_mel=True, vocode=False)
        b_args = (pipe.params, pipe.vocoder_params, mu_x, w_ceil, y_lengths,
                  x_mask, spk_e, temp, rng, ds)
        flops_b, bytes_b = _cost_of(stage_b.lower(*b_args))

        def dec_call(i, acc, *a):
            a = list(a)
            a[8] = (a[8] + jnp.uint32(i)).astype(jnp.uint32)
            out = stage_b(*a)
            return out["mel"].astype(jnp.float32)

        ms_b = amortized_ms(dec_call, b_args)
        stage_entries.append(_entry(
            f"cfm_decode_b1_t{t_bucket}_m{m_bucket}_{args.steps}steps",
            flops_b, ms_b, peak, bytes_b, peak_bw))

        # HiFi-GAN at the same mel bucket, via the pipeline's backend policy
        mel_out = np.asarray(jax.device_get(stage_b(*b_args)["mel"]), np.float32)
        voc_fn = jax.jit(lambda p, m: pipe._vocode(p, m))
        flops_v, bytes_v = _cost_of(voc_fn.lower(pipe.vocoder_params, mel_out))

        def voc_call(i, acc, p, m):
            return voc_fn(p, m + jnp.float32(i) * 1e-6).astype(jnp.float32)

        ms_v = amortized_ms(voc_call, (pipe.vocoder_params, mel_out))
        backend = "pallas" if pipe._pallas_voc else "xla"
        voc_entry = _entry(
            f"hifigan_{backend}_b1_m{m_bucket}", flops_v, ms_v, peak, bytes_v, peak_bw)
        if pipe._pallas_voc and pipe_xla is not None:
            xla_voc = jax.jit(lambda p, m: pipe_xla._vocode(p, m))
            true_flops_v, _ = _cost_of(xla_voc.lower(pipe.vocoder_params, mel_out))
            _add_true_flops(voc_entry, true_flops_v, peak)
        stage_entries.append(voc_entry)

        # denoiser (STFT → bias subtract → iSTFT)
        wav_in = np.asarray(
            jax.device_get(voc_fn(pipe.vocoder_params, mel_out)), np.float32)
        den_fn = jax.jit(lambda w, s: pipe.denoiser(w, s))
        flops_d, bytes_d = _cost_of(den_fn.lower(wav_in, ds))

        def den_call(i, acc, w, s):
            return den_fn(w + jnp.float32(i) * 1e-9, s).astype(jnp.float32)

        ms_d = amortized_ms(den_call, (wav_in, ds))
        stage_entries.append(_entry(
            f"denoiser_b1_{wav_in.shape[1]}samp", flops_d, ms_d, peak, bytes_d, peak_bw))

        stage_sum = sum(e["device_ms_per_call"] for e in stage_entries)
        stage_meta = {
            "stage_sum_ms": round(stage_sum, 3),
            "fused_ms": round(ms_syn, 3),
            "fusion_gain_pct": round(100.0 * (1 - ms_syn / stage_sum), 1)
            if stage_sum > 0 else float("nan"),
        }

    # ---- 1c. precision sweep over the same fused path (VERDICT r5 #1):
    # which stages repay bf16 matmul inputs.  Every variant keeps noise
    # drawn in f32 and duration math f32 (model invariants); "two-stage
    # decoder_bf16" additionally keeps the whole encoder f32.
    sweep = []
    if not args.skip_sweep:
        def measure_fused(p, label):
            fn = p._get_fused(t_bucket, m_bucket, 1, args.steps, True, False, True)
            fargs = (p.params, p.vocoder_params, x, x_lengths, spk_arr, ls, temp, rng, ds)

            def call(i, acc, *a):
                a = list(a)
                a[7] = (a[7] + jnp.uint32(i)).astype(jnp.uint32)
                return fn(*a)["wav"].astype(jnp.float32)

            fl, by = _cost_of(fn.lower(*fargs))
            ms = amortized_ms(call, fargs)
            ent = _entry(label, fl, ms, peak, by, peak_bw)
            # single-dispatch wall (what RTF sees), fresh key per call so
            # content-dedup can't fake it
            walls = []
            for k in range(5):
                import datetime as _dt
                key = host_prng_key(1000 + k)
                t0 = _dt.datetime.now()
                w = fn(p.params, p.vocoder_params, x, x_lengths, spk_arr, ls,
                       temp, key, ds)["wav"]
                np.asarray(jax.device_get(w))
                walls.append((_dt.datetime.now() - t0).total_seconds() * 1e3)
            ent["wall_ms_single_dispatch"] = round(float(np.median(walls)), 2)
            return ent

        def mk(**kw):
            return SynthesisPipeline(
                root.model, pipe.params, root.vocoder, pipe.vocoder_params,
                cleaners=("basic_cleaners",), **kw)

        variants = [
            ("fused_f32_pallas_mrf", mk()),          # the shipped default
            ("fused_f32_xla_voc", mk(vocoder_backend="xla")),
            ("fused_f32_acoustic_bf16_voc",
             mk(vocoder_backend="xla", vocoder_dtype=jnp.bfloat16)),
            ("fused_all_bf16", mk(compute_dtype=jnp.bfloat16)),
        ]
        for label, p in variants:
            try:
                sweep.append(measure_fused(p, label))
            except Exception as e:  # noqa: BLE001 — a variant that fails to
                # compile must not void the rest of the artifact
                sweep.append({"program": label, "error": f"{type(e).__name__}: {e}"})
        # the Pallas variant's cost-model FLOPs omit the custom-call work;
        # its XLA twin in the same sweep counts it (identical math)
        by_name = {s.get("program"): s for s in sweep}
        pal, xla = by_name.get("fused_f32_pallas_mrf"), by_name.get("fused_f32_xla_voc")
        if pal and xla and "flops_per_call" in pal and "flops_per_call" in xla:
            _add_true_flops(pal, xla["flops_per_call"], peak)

        # two-stage split: encoder+duration f32, decoder/vocoder bf16 — the
        # per-stage mixed-precision point; wall-clock only (two dispatches +
        # one host sync cross the tunnel, amortized slope doesn't apply)
        for label, p in [("two_stage_f32_pallas", mk()),
                         ("two_stage_decoder_bf16",
                          mk(compute_dtype=jnp.bfloat16))]:
            try:
                p.synthesise([BENCH_TEXT], spks=[spk], n_timesteps=args.steps,
                             seed=0, keep_mel=False, pcm16=True)  # warm

                def once(k=[0]):
                    k[0] += 1
                    r = p.synthesise([BENCH_TEXT], spks=[spk],
                                     n_timesteps=args.steps, seed=1000 + k[0],
                                     keep_mel=False, pcm16=True)[0]
                    return r
                import datetime as _dt
                ts = []
                for i in range(5):
                    t0 = _dt.datetime.now()
                    once()
                    ts.append((_dt.datetime.now() - t0).total_seconds() * 1e3)
                sweep.append({"program": label,
                              "wall_ms_single_dispatch": round(float(np.median(ts)), 2)})
            except Exception as e:  # noqa: BLE001
                sweep.append({"program": label, "error": f"{type(e).__name__}: {e}"})

    # ---- 2. training step at the flagship committed shape
    if not args.skip_train:
        from emojivoice_tpu.training.state import create_train_state, make_train_step

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
        flops_train, bytes_train = _cost_of(step1.lower(state, batch, key))
        # timing via K Python-unrolled optimizer steps over the SAME batch
        # inside one jit (per-step PRNG still differs — step_fn folds in
        # state.step).  NOT the stacked-batch multi-step program: its (K,B)
        # batch ships K× the bytes per dispatch, and through this
        # environment's ~25 MB/s tunnel that transfer dominates the slope
        # (~20 ms/step of wire time measured masquerading as compute).
        from emojivoice_tpu.training.state import _build_step_fn

        step_fn = _build_step_fn(model_cfg, root.optimizer, "f32")

        def make_unrolled(k):
            @jax.jit
            def run(st, bt, kk):
                m = None
                for _ in range(k):
                    st, m = step_fn(st, bt, kk)
                return st, m
            return run

        def run_k(n):
            runner = make_unrolled(n)
            st = create_train_state(model_cfg, root.optimizer, seed=0)
            holder = {"st": runner(st, batch, key)[0]}  # compile

            def once():
                out, m = runner(holder["st"], batch, key)
                holder["st"] = out
                float(jnp.sum(m["loss"]))  # force full completion
            return time_median(once, n=5)

        t1, t8 = run_k(1), run_k(8)
        ms_train = (t8 - t1) / 7.0
        entries.append(_entry(
            f"train_step_b{b}_tx{tx_len}_ty{ty_len}_outsize{args.out_size}",
            flops_train, ms_train, peak, bytes_train, peak_bw))
    else:
        rng_np = np.random.default_rng(0)

    # ---- 3. HiFi-GAN generator alone at serving shape (plain XLA flax path)
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    voc = HiFiGANGenerator(cfg=root.vocoder)
    mel = np.asarray(rng_np.normal(size=(1, args.voc_frames, root.vocoder.num_mels)),
                     np.float32)
    voc_params = voc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, root.vocoder.num_mels)))
    voc_fn2 = jax.jit(voc.apply)
    flops_voc, bytes_voc = _cost_of(voc_fn2.lower(voc_params, mel))

    def voc_call2(i, acc, p, m):
        return voc_fn2(p, m + (jnp.float32(i) * 1e-6))

    ms_voc = amortized_ms(voc_call2, (voc_params, mel))
    entries.append(_entry(f"hifigan_b1_t{args.voc_frames}", flops_voc, ms_voc, peak,
                          bytes_voc, peak_bw))

    report = {
        "device_kind": device_kind,
        "backend": jax.default_backend(),
        "jax": jax.__version__,
        "compute_dtype": "float32",
        "note": ("FLOPs/bytes from XLA cost_analysis; per-call ms is the "
                 "two-depth loop slope (dispatch/tunnel RTT removed); "
                 "roofline_bound compares arithmetic intensity to the "
                 "ridge (peak bf16 FLOPs / peak HBM BW).  cost_analysis "
                 "does not count FLOPs inside Pallas custom calls — "
                 "*_true fields use the XLA-lowered twin's FLOP count for "
                 "programs carrying Pallas kernels.  bytes accessed is the "
                 "HLO cost model's estimate, an upper bound on HBM traffic "
                 "(fusion keeps intermediates on-chip), so achieved_gbps "
                 "can exceed the HBM peak for well-fused programs"),
        "programs": entries,
    }
    if stage_entries:
        report["stages"] = {"programs": stage_entries, **stage_meta}
    if sweep:
        report["precision_sweep"] = sweep
    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
