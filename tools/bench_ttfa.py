"""Conversational time-to-first-audio (TTFA) → docs/artifacts/ttfa.json.

BASELINE #3 asks for low first-audio latency on the feel_me path; VERDICT r3
weak #4 noted streaming buys nothing at conversational lengths because the
CFM must finish before the first vocoder chunk.  This measures, per
utterance length, text-in → first-audible-sample-out under three strategies:

  full        synthesise the whole reply, then play (the reference's
              feel_me.py:189-203 behavior) — TTFA = whole-reply synthesis;
  stream      full-text CFM, then chunked streaming vocoder — TTFA =
              CFM(full) + one vocoder chunk;
  pipelined   sentence-split dispatch-ahead (inference/longform.py
              stream_longform): speak sentence 1 while sentence 2
              synthesizes — TTFA = ONE short segment's synthesis, the
              conversational floor.

Each strategy is warmed first (compiles excluded — steady-state serving).

Run: python tools/bench_ttfa.py [--cpu --preset tiny] [--out docs/artifacts/ttfa.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TEXTS = {
    "short_reply_1s": "That sounds like a wonderful plan!",
    "reply_2sent_4s": ("That sounds like a wonderful plan! We could pack a basket "
                       "and walk down to the old harbor together."),
    "story_turn_10s": ("Once upon a time a little robot lived by the sea. Every "
                       "morning it counted the silver waves and hummed a tiny tune. "
                       "One day a storm arrived, and the robot decided to build a "
                       "lighthouse from driftwood and bottle glass. All the gulls "
                       "came to watch it glow."),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--preset", default="emoji_multi")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--segment_chars", type=int, default=120)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from emojivoice_tpu import config as cfglib
    from emojivoice_tpu.config import enable_compilation_cache
    from emojivoice_tpu.inference.longform import stream_longform
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.inference.streaming import auto_stream, stream_synthesise

    enable_compilation_cache()
    root = cfglib.get_preset(args.preset)
    pipe = SynthesisPipeline.from_random(root_cfg=root, cleaners=("basic_cleaners",))
    spk = min(79, root.model.n_spks - 1)
    kw = dict(n_timesteps=args.steps, seed=0)

    def measure(fn):
        """Median (TTFA_ms, total_ms, audio_s) over reps; fn() must return an
        iterator of waveform chunks — TTFA is time to the first one."""
        rows = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            it = fn()
            first = next(it)
            t_first = time.perf_counter() - t0
            n = len(np.atleast_1d(first))
            for c in it:
                n += len(np.atleast_1d(c))
            t_total = time.perf_counter() - t0
            rows.append((t_first * 1e3, t_total * 1e3, n / 22050.0))
        med = np.median(np.asarray(rows), axis=0)
        return {"ttfa_ms": round(float(med[0]), 1),
                "total_ms": round(float(med[1]), 1),
                "audio_s": round(float(med[2]), 2)}

    report = {"preset": args.preset, "steps": args.steps,
              "backend": jax.default_backend(),
              "device_kind": getattr(jax.devices()[0], "device_kind", "cpu"),
              "segment_chars": args.segment_chars, "reps": args.reps,
              "lengths": {}}
    for name, text in TEXTS.items():
        full = lambda: iter([pipe.synthesise([text], spks=[spk], **kw)[0].wav])  # noqa: E731
        stream = lambda: stream_synthesise(pipe, text, spk=spk, **kw)  # noqa: E731
        pipelined = lambda: stream_longform(pipe, text, spk=spk,  # noqa: E731
                                            max_chars=args.segment_chars, **kw)
        auto = lambda: auto_stream(pipe, text, spk=spk,  # noqa: E731
                                   segment_chars=args.segment_chars, **kw)
        entry = {}
        for strat, fn in (("full", full), ("stream", stream),
                          ("pipelined", pipelined), ("auto", auto)):
            for c in fn():  # warm every program this strategy needs
                pass
            entry[strat] = measure(fn)
        report["lengths"][name] = entry
        # the selector's whole point: auto must track best-of per length
        best = min(e["ttfa_ms"] for s, e in entry.items() if s != "auto")
        if entry["auto"]["ttfa_ms"] > 1.25 * best:
            print(f"[ttfa] WARNING {name}: auto {entry['auto']['ttfa_ms']}ms "
                  f"vs best {best}ms", file=sys.stderr, flush=True)
        print(f"[ttfa] {name}: " + "  ".join(
            f"{s}={e['ttfa_ms']}ms/{e['audio_s']}s" for s, e in entry.items()),
            file=sys.stderr, flush=True)

    out = json.dumps(report, indent=1)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
