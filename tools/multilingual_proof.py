"""Multilingual long-form synthesis proof on the real TPU (BASELINE #6).

Runs the case-study storytelling lines translated into fr/de/es/ja (plus the
English originals) through the full long-form path — language cleaner →
sentence split/re-pack → per-segment compiled synthesis at flagship dims —
on the real chip, and records per-language RTF + output stats.

The image ships no espeak, so the fr/de/ja cleaners run their documented
grapheme fallback (the pipeline is identical either way; only the
phonetization step is substituted — text/cleaners.py).  Weights are fixed-
seed random flagship init: the proof is the end-to-end multilingual path +
performance on TPU, not audio quality (released checkpoints aren't in the
image; tools/parity_report.py covers fidelity the moment they are).

Run: python tools/multilingual_proof.py [--out docs/artifacts/tpu_multilingual]
Writes proof.json (one entry per language) and prints it.
"""

from __future__ import annotations

import argparse
import datetime as dt
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Opening lines of the case_2 storytelling script (case_studies/case_2,
# reference uses them verbatim in English), translated per language.
TEXTS = {
    "en": "Once upon a time, in a quiet village, a small robot woke up. "
          "It looked at the sky and wondered what the day would bring! "
          "The villagers had never seen anything like it before.",
    "fr": "Il était une fois, dans un village tranquille, un petit robot qui "
          "se réveilla. Il regarda le ciel et se demanda ce que la journée "
          "allait apporter ! Les villageois n'avaient jamais rien vu de tel.",
    "de": "Es war einmal ein kleiner Roboter, der in einem ruhigen Dorf "
          "erwachte. Er blickte zum Himmel und fragte sich, was der Tag wohl "
          "bringen würde! So etwas hatten die Dorfbewohner noch nie gesehen.",
    "es": "Érase una vez, en un pueblo tranquilo, un pequeño robot que "
          "despertó. Miró al cielo y se preguntó qué le depararía el día. "
          "Los aldeanos nunca habían visto nada igual.",
    "ja": "むかしむかし、静かな村で小さなロボットが目を覚ましました。"
          "空を見上げて、今日は何が起こるだろうと考えました。"
          "村人たちはそんなものを見たことがありませんでした。",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/artifacts/tpu_multilingual")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--preset", default="emoji_multi")
    ap.add_argument("--cpu", action="store_true", help="smoke-test backend")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    from emojivoice_tpu.config import enable_compilation_cache, get_preset
    from emojivoice_tpu.inference.longform import split_text, synthesise_longform
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline

    enable_compilation_cache()
    pipe = SynthesisPipeline.from_random(get_preset(args.preset), seed=0)
    sr = 22050

    os.makedirs(args.out, exist_ok=True)
    report = {"backend": jax.default_backend(), "steps": args.steps,
              "model": f"{args.preset} random-init (seed 0)", "languages": {}}
    for lang, text in TEXTS.items():
        # warm the per-bucket programs so RTF excludes compilation, matching
        # the reference's warmed RTF reporting (cli.py:314-316)
        synthesise_longform(pipe, text, spk=3, language=lang,
                            n_timesteps=args.steps, seed=0)
        t0 = dt.datetime.now()
        wav = synthesise_longform(pipe, text, spk=3, language=lang,
                                  n_timesteps=args.steps, seed=0)
        wall = (dt.datetime.now() - t0).total_seconds()
        audio_s = len(wav) / sr
        report["languages"][lang] = {
            "chars": len(text),
            "segments": len(split_text(text)),
            "audio_seconds": round(audio_s, 3),
            "wall_seconds": round(wall, 3),
            "rtf": round(wall / audio_s, 5),
            "wav_abs_max": round(float(abs(wav).max()), 4),
        }
        print(lang, report["languages"][lang], flush=True)

    report["generated"] = dt.datetime.now().isoformat(timespec="seconds")
    with open(os.path.join(args.out, "proof.json"), "w") as f:
        json.dump(report, f, indent=2, ensure_ascii=False)
    print(json.dumps({"ok": True, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
