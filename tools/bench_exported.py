"""RTF of the AOT-exported bundle vs the live pipeline (real TPU).

The reference ships an ONNX runner that reports RTF on the exported graph
(Matcha-TTS/matcha/onnx/infer.py:136-146); this is the analog for our
StableHLO bundle (VERDICT round-2 next #4: "a bench point on the exported
path").  Exports one (batch=1, text=128, mel=512) signature — the same
shape bench.py exercises live — then times warmed calls through
ExportedSynthesizer and through the live SynthesisPipeline on the same
text/seed and reports both.

Run: python tools/bench_exported.py [--out docs/artifacts/exported_bench.json]
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# same utterance bench.py times on the live path (fits the 128 text bucket)
TEXT = ("The quick brown fox jumped over the lazy dog, and everyone at the "
        "party cheered loudly for the brave little robot.")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/artifacts/exported_bench.json")
    ap.add_argument("--bundle", default="/tmp/exported_bundle")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--cpu", action="store_true", help="smoke-test backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    enable_compilation_cache()
    pipe = SynthesisPipeline.from_random(cleaners=("basic_cleaners",), seed=0)

    t0 = dt.datetime.now()
    # pcm16: the same on-device int16 quantization bench.py's live fused
    # path uses — halves the D2H payload, the dominant tunnel cost
    export_bundle(pipe, args.bundle, text_buckets=[256], mel_buckets=[512],
                  batches=(1,), n_timesteps=args.steps, pcm16=True)
    export_s = (dt.datetime.now() - t0).total_seconds()
    runner = LoadedBundle(args.bundle)

    def timed(fn):
        fn()  # warm (compile/load)
        walls, audio = [], 0.0
        for _ in range(args.repeats):
            t0 = dt.datetime.now()
            a = fn()
            walls.append((dt.datetime.now() - t0).total_seconds())
            audio = a
        return float(np.mean(walls)), float(np.std(walls)), audio

    from emojivoice_tpu.inference.pipeline import SAMPLE_RATE as sr

    def run_exported():
        results, _ = runner.synthesise([TEXT], spks=[3], seed=0)
        return len(results[0]["wav"]) / sr

    def run_live():
        # the headline bench.py configuration: fused single dispatch, pcm16
        res = pipe.synthesise([TEXT], spks=[3], n_timesteps=args.steps, seed=0,
                              fused=True, fused_mel_bucket=512,
                              keep_mel=False, pcm16=True)[0]
        return len(res.wav) / sr

    exp_mean, exp_std, exp_audio = timed(run_exported)
    live_mean, live_std, live_audio = timed(run_live)

    report = {
        "backend": jax.default_backend(),
        "text_chars": len(TEXT),
        "steps": args.steps,
        "repeats": args.repeats,
        "export_wall_s": round(export_s, 1),
        "exported": {"audio_s": round(exp_audio, 3),
                     "wall_s_mean": round(exp_mean, 4), "wall_s_std": round(exp_std, 4),
                     "rtf": round(exp_mean / exp_audio, 5)},
        "live": {"audio_s": round(live_audio, 3),
                 "wall_s_mean": round(live_mean, 4), "wall_s_std": round(live_std, 4),
                 "rtf": round(live_mean / live_audio, 5)},
        "generated": dt.datetime.now().isoformat(timespec="seconds"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
