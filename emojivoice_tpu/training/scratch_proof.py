"""`emojivoice-scratch-proof` — from-scratch convergence proof.

The reference's primary story is training MatchaTTS from RANDOM INIT until
the MAS→duration→prior→CFM loop converges (Matcha-TTS/matcha/train.py:79,
matcha_tts.py:154-245); its only convergence evidence is loss curves plus
eyeballed TensorBoard alignment images.  This proof makes that measurable:

1. build a synthetic *alignable* corpus — every character is rendered as a
   tone whose pitch is keyed by the character and whose length is keyed by
   its class, so the audio has a TRUE monotonic text↔mel alignment with
   near-uniform per-token durations (unlike the train-proof's harmonic
   stacks, where no ground-truth alignment exists);
2. run the real training CLI from random init (NO surrogate checkpoint,
   no ``--from_torch_ckpt``) with ``--probe_every``, which logs
   MatchaTTS.training_probe on a fixed batch: MAS diagonality, MAS-duration
   drift between probes, predicted-vs-MAS duration MSE, and teacher-forced
   reconstruction L1;
3. assert alignment EMERGENCE, not just loss decrease:
   (a) diagonality rises from the degenerate random-init value,
   (b) the MAS path stops moving (drift L1 shrinks),
   (c) predicted durations converge to the MAS durations (dur_mse_log → ~0),
   (d) teacher-forced mel L1 to ground truth shrinks;
4. free-synthesise a TRAINING sentence through the serving path and compare
   to its ground-truth mel: predicted total duration within a stated budget
   of the true length, and mel L1 (over the overlapping frames, normalized
   domain) under the random-init teacher-forced baseline.

The committed artifact of the flagship run lives in
docs/artifacts/scratch_proof/ (metrics.jsonl + summary.json);
tests/test_scratch_proof.py runs the same harness at tiny dims on CPU.
"""

from __future__ import annotations

import argparse
import json
import math
import shutil
from pathlib import Path

import numpy as np

# lowercase ascii only: basic_cleaners lowercases + collapses whitespace, so
# the rendered audio and the cleaned token stream stay 1:1
ALIGN_TEXTS = [
    "the robot tells a story",
    "a brave little voice sings",
    "hello from the green island",
    "we walk down to the harbor",
    "rain falls on the tin roof",
    "the kettle sings so softly",
    "count the seven silver stars",
    "an old door creaks open",
    "waves brush over the sand",
    "morning light arrives early",
]

_VOWELS = set("aeiou")

_CONNECTORS = (" and ", " then ", " while ", " until ", " because ")


def make_texts(n: int, seed: int = 0):
    """n deterministic texts with a WIDE length spread: 1–4 base phrases
    joined by connectors.  Lengths span ~25 to ~120 chars, which at the
    renderer's ~0.11 s/char covers ~2.5–13 s of audio → mel lengths across
    four buckets (256/512/768/1024) — the corpus stresses MAS at several
    T_text×T_mel shapes instead of one (VERDICT r5 #6)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        k = 1 + (i % 4)  # 1..4 phrases, uniformly cycled
        parts = [ALIGN_TEXTS[int(rng.integers(len(ALIGN_TEXTS)))] for _ in range(k)]
        text = parts[0]
        for ptxt in parts[1:]:
            text += _CONNECTORS[int(rng.integers(len(_CONNECTORS)))] + ptxt
        out.append(text)
    return out


def _char_f0(c: str) -> float:
    """Deterministic character→pitch map over two octaves — a wide spread
    keeps adjacent characters' spectra far apart, so the Gaussian log-prior
    discriminates tokens sharply and MAS has an unambiguous best path."""
    return 110.0 * 2.0 ** ((ord(c) * 7) % 24 / 12.0)


def _char_dur(c: str) -> float:
    if c == " ":
        return 0.06
    return 0.16 if c in _VOWELS else 0.10


def render_utterance(text: str, spk: int, sample_rate: int = 22050,
                     seed: int = 0) -> np.ndarray:
    """Melodic spelling: each character becomes a tone segment with an
    attack/decay envelope; speakers differ by harmonic timbre and speaking
    rate.  The true alignment is monotonic with per-character durations
    known by construction — exactly the structure MAS must discover."""
    rng = np.random.default_rng(seed * 1000 + spk)
    rate = 1.0 + 0.12 * ((spk % 5) - 2) / 2.0  # speaker-consistent tempo
    # speaker timbre: harmonic amplitude rolloff
    rolloff = 1.2 + (spk % 7) / 6.0
    segs = []
    for c in text:
        dur = _char_dur(c) * rate * (1.0 + 0.03 * rng.normal())
        n = max(8, int(dur * sample_rate))
        t = np.arange(n) / sample_rate
        if c == " ":
            segs.append(0.003 * rng.normal(size=n).astype(np.float32))
            continue
        f0 = _char_f0(c)
        tone = sum((0.5 / h ** rolloff) * np.sin(2 * np.pi * f0 * h * t)
                   for h in (1, 2, 3))
        # attack/decay so segment boundaries are visible in the mel
        env = np.minimum(1.0, np.minimum(t / 0.012, (t[-1] - t + 1e-6) / 0.03))
        segs.append((tone * env).astype(np.float32))
    wav = np.concatenate(segs)
    wav = 0.7 * wav / max(1e-6, np.abs(wav).max())
    return (wav + 0.004 * rng.normal(size=wav.shape)).astype(np.float32)


def make_alignable_dataset(root: Path, speakers, n_utts: int = 20,
                           sample_rate: int = 22050, seed: int = 0,
                           long_texts: bool = False):
    """``long_texts=True`` draws from make_texts (1–4 joined phrases, wide
    length spread over several mel buckets); False keeps the short
    single-phrase corpus (CPU-test scale)."""
    from scipy.io import wavfile

    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    texts = make_texts(n_utts, seed) if long_texts else None
    rows = []
    stats = {"chars": [], "seconds": []}
    for i in range(n_utts):
        spk = speakers[i % len(speakers)]
        text = texts[i] if long_texts else ALIGN_TEXTS[i % len(ALIGN_TEXTS)]
        wav = render_utterance(text, spk, sample_rate, seed=seed + i)
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, sample_rate, wav)
        rows.append(f"{path}|{spk}|{text}")
        stats["chars"].append(len(text))
        stats["seconds"].append(len(wav) / sample_rate)
    train = root / "train.txt"
    train.write_text("\n".join(rows) + "\n")
    val = root / "val.txt"
    val.write_text("\n".join(rows[:2]) + "\n")
    corpus_stats = {
        "n_utts": n_utts, "n_speakers": len(set(speakers)),
        "chars_min": int(np.min(stats["chars"])),
        "chars_max": int(np.max(stats["chars"])),
        "chars_mean": round(float(np.mean(stats["chars"])), 1),
        "audio_s_total": round(float(np.sum(stats["seconds"])), 1),
        "audio_s_min": round(float(np.min(stats["seconds"])), 2),
        "audio_s_max": round(float(np.max(stats["seconds"])), 2),
    }
    return train, val, corpus_stats


def run_scratch_proof(preset: str, out_dir: str, steps: int = 600,
                      batch_size: int = 4, num_devices: int = 1,
                      probe_every: int = 50, seed: int = 0, utts: int = 20,
                      n_speakers: int = 3, out_size: int | None = None,
                      lr: float = 1e-3, log_every: int = 10,
                      scheduler: str | None = None, warmup_steps: int = 0,
                      lr_end: float = 0.0,
                      use_compilation_cache: bool = False,
                      wire_f16: bool = False,
                      length_budget: float = 0.35,
                      assert_emergence: bool = True,
                      assert_free_synth: bool = True,
                      long_texts: bool = False) -> dict:
    """Train from random init on the alignable corpus and verify emergence.

    length_budget: |predicted − true| / true total-duration tolerance for the
    final free synthesis of a training sentence.  assert_free_synth gates the
    length/mel budget asserts separately — short CPU smoke runs converge the
    alignment metrics long before the duration predictor is usable.
    """
    import jax

    if use_compilation_cache:
        from emojivoice_tpu.config import enable_compilation_cache

        enable_compilation_cache()

    from emojivoice_tpu import config as cfglib
    from emojivoice_tpu.training.train import main as train_main

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    root_cfg = cfglib.get_preset(preset)
    speakers = tuple(range(min(n_speakers, root_cfg.model.n_spks)))
    train_fl, val_fl, corpus_stats = make_alignable_dataset(
        out / "data", speakers, n_utts=utts, seed=seed, long_texts=long_texts)

    run_dir = out / "run"
    rc = train_main([
        "--preset", preset,
        "--train_filelist", str(train_fl),
        "--valid_filelist", str(val_fl),
        "--out_dir", str(run_dir),
        "--batch_size", str(batch_size),
        "--max_steps", str(steps),
        "--num_devices", str(num_devices),
        # NO --from_torch_ckpt: random init is the point
        "--probe_every", str(probe_every),
        "--log_every", str(log_every),
        "--lr", str(lr),
        "--val_every_steps", "0",
        "--ckpt_every_steps", "0",
        "--render_val_samples", "0",
        "--seed", str(seed),
        "--cache_data",
    ] + (["--out_size", str(out_size)] if out_size else [])
      + (["--scheduler", scheduler, "--decay_steps", str(max(1, steps - warmup_steps)),
          "--warmup_steps", str(warmup_steps), "--lr_end", str(lr_end)]
         if scheduler else [])
      + (["--wire_f16"] if wire_f16 else []))
    assert rc == 0, "training CLI failed"

    metrics = [json.loads(l)
               for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    probes = [m for m in metrics if m["tag"] == "probe"]
    assert len(probes) >= 3, f"need >=3 probes, got {len(probes)}"
    first, last = probes[0], probes[-1]
    drifts = [p["mas_drift_l1"] for p in probes
              if p["mas_drift_l1"] is not None and math.isfinite(p["mas_drift_l1"])]

    trains = [m for m in metrics if m["tag"] == "train"]
    loss_first = float(np.mean([m["loss"] for m in trains[:5]]))
    loss_last = float(np.mean([m["loss"] for m in trains[-5:]]))

    # ---- compiled-shape census + sustained step rate (VERDICT r5 #6).
    # The train CLI logs every distinct (B, T_text, T_mel) program with its
    # first-dispatch step; over a long run new shapes must stop appearing
    # (bounded recompiles) and the step rate must HOLD after the compile-
    # heavy head.
    import datetime as _dtm

    shapes_rec = next((m for m in metrics if m["tag"] == "shapes"), None)
    census = None
    if shapes_rec is not None:
        last_new = max(s["first_step"] for s in shapes_rec["shapes"])
        census = {"distinct_shapes": shapes_rec["distinct_shapes"],
                  "last_new_shape_step": last_new,
                  "shapes": shapes_rec["shapes"]}
    rate = None
    if len(trains) >= 8:
        ts = [_dtm.datetime.fromisoformat(m["time"]) for m in trains]
        steps_arr = [m["step"] for m in trains]
        mid = len(trains) // 2

        def _rate(lo, hi):
            span = (ts[hi] - ts[lo]).total_seconds()
            return (steps_arr[hi] - steps_arr[lo]) / span if span > 0 else float("nan")

        rate = {"first_half_steps_per_s": round(_rate(0, mid), 2),
                "second_half_steps_per_s": round(_rate(mid, len(trains) - 1), 2)}

    # ---- final free synthesis of a training sentence vs its ground truth
    import dataclasses as _dc

    import jax.numpy as jnp  # noqa: F401  (jax initialized above)

    from emojivoice_tpu.data.dataset import TextMelDataset
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(run_dir / "ckpts"))
    served_cfg = mgr.load_config()
    restored = mgr.restore()
    params = restored["params"] if "params" in restored else restored
    mgr.close()

    data_cfg = _dc.replace(root_cfg.data, train_filelist_path=str(train_fl),
                           valid_filelist_path=str(val_fl), seed=seed)
    ds = TextMelDataset(str(train_fl), data_cfg)
    item = ds[0]
    gt_mel = np.asarray(item["y"])  # normalized (T, n_feats)
    _, spk, text = ds.items[0]

    pipe = SynthesisPipeline(served_cfg.model, params, cleaners=data_cfg.cleaners)
    res = pipe.synthesise([text], spks=[spk] if served_cfg.model.n_spks > 1 else None,
                          n_timesteps=10, seed=0)[0]
    stats = served_cfg.model.data_statistics
    pred_mel = (np.asarray(res.mel) - stats.mel_mean) / stats.mel_std
    t_pred, t_gt = pred_mel.shape[0], gt_mel.shape[0]
    length_err = abs(t_pred - t_gt) / t_gt
    n = min(t_pred, t_gt)
    mel_l1 = float(np.mean(np.abs(pred_mel[:n] - gt_mel[:n])))

    summary = {
        "preset": preset, "steps": steps, "batch_size": batch_size,
        "devices": num_devices, "lr": lr, "seed": seed, "utts": utts,
        "speakers": list(speakers), "from_scratch": True,
        "long_texts": long_texts,
        "corpus": corpus_stats,
        "shape_census": census,
        "step_rate": rate,
        "loss_first5_mean": round(loss_first, 4),
        "loss_last5_mean": round(loss_last, 4),
        "probe_steps": [p["step"] for p in probes],
        "diagonality": [round(p["diagonality"], 4) for p in probes],
        "mas_drift_l1": [round(d, 4) for d in drifts],
        "dur_mse_log": [round(p["dur_mse_log"], 4) for p in probes],
        "dur_mae_frames": [round(p["dur_mae_frames"], 4) for p in probes],
        "prior_mel_l1": [round(p["prior_mel_l1"], 4) for p in probes],
        "tf_mel_l1": [round(p["tf_mel_l1"], 4) for p in probes],
        "mas_dur_row0_first": first.get("mas_dur_row0"),
        "mas_dur_row0_last": last.get("mas_dur_row0"),
        "free_synth": {
            "text": text, "speaker": spk,
            "frames_pred": t_pred, "frames_gt": t_gt,
            "length_err": round(length_err, 4),
            "length_budget": length_budget,
            "mel_l1_overlap": round(mel_l1, 4),
            "mel_l1_budget_random_init_tf": round(first["tf_mel_l1"], 4),
        },
        "backend": jax.default_backend(),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))

    if assert_emergence:
        # (a) alignment emergence: diagonality rises from random init
        assert last["diagonality"] > first["diagonality"], \
            f"diagonality did not rise: {first['diagonality']:.4f} → {last['diagonality']:.4f}"
        # (b) the MAS path settles: final drift below the first measured drift
        assert drifts[-1] < drifts[0], \
            f"MAS drift did not shrink: {drifts[0]:.4f} → {drifts[-1]:.4f}"
        # (c) duration predictor converges onto the MAS durations
        assert last["dur_mse_log"] < first["dur_mse_log"], \
            f"dur_mse_log did not fall: {first['dur_mse_log']:.4f} → {last['dur_mse_log']:.4f}"
        # (d) teacher-forced reconstruction approaches the target
        assert last["tf_mel_l1"] < first["tf_mel_l1"], \
            f"tf_mel_l1 did not fall: {first['tf_mel_l1']:.4f} → {last['tf_mel_l1']:.4f}"
        assert loss_last < loss_first, \
            f"loss did not decrease: {loss_first:.4f} → {loss_last:.4f}"
        if census is not None and steps >= 1000:
            # recompiles bounded: every program appears in the first half —
            # a shape compiling late would mean unbounded recompile exposure
            assert census["last_new_shape_step"] <= steps // 2, \
                f"new program shape appeared at step {census['last_new_shape_step']}"
        if rate is not None and steps >= 1000:
            # the sustained rate must hold (the first half carries the
            # compile stalls, so the second half should be at least as fast)
            assert rate["second_half_steps_per_s"] >= 0.8 * rate["first_half_steps_per_s"], \
                f"step rate decayed: {rate}"
    if assert_emergence and assert_free_synth:
        # (e) free synthesis: duration model lands within the length budget
        # and the mel beats the random-init teacher-forced reconstruction
        assert length_err <= length_budget, \
            f"predicted length off by {length_err:.2%} (> {length_budget:.0%})"
        assert mel_l1 < first["tf_mel_l1"], \
            f"free-synth mel L1 {mel_l1:.4f} not under random-init TF baseline " \
            f"{first['tf_mel_l1']:.4f}"
    return summary


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="emojivoice-scratch-proof")
    p.add_argument("--preset", default="emoji_multi")
    p.add_argument("--out_dir", default="scratch_proof_out")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=1)
    p.add_argument("--probe_every", type=int, default=50)
    p.add_argument("--utts", type=int, default=20)
    p.add_argument("--n_speakers", type=int, default=3)
    p.add_argument("--out_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--scheduler", default=None, choices=[None, "constant", "exponential", "cosine"])
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--lr_end", type=float, default=0.0)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--length_budget", type=float, default=0.35)
    p.add_argument("--long_texts", action="store_true",
                   help="wide-length corpus (1-4 joined phrases, several mel "
                        "buckets) — the realism-scaled v2 proof")
    p.add_argument("--no_assert", action="store_true",
                   help="report metrics without the emergence asserts")
    p.add_argument("--compilation_cache", action="store_true")
    p.add_argument("--wire_f16", action="store_true")
    p.add_argument("--artifact_dir", default=None,
                   help="copy metrics.jsonl + summary.json here (committed evidence)")
    args = p.parse_args(argv)
    run_scratch_proof(
        args.preset, args.out_dir, steps=args.steps, batch_size=args.batch_size,
        num_devices=args.num_devices, probe_every=args.probe_every,
        seed=args.seed, utts=args.utts, n_speakers=args.n_speakers,
        out_size=args.out_size, lr=args.lr, log_every=args.log_every,
        scheduler=args.scheduler, warmup_steps=args.warmup_steps,
        lr_end=args.lr_end,
        use_compilation_cache=args.compilation_cache, wire_f16=args.wire_f16,
        length_budget=args.length_budget, long_texts=args.long_texts,
        assert_emergence=not args.no_assert)
    if args.artifact_dir:
        art = Path(args.artifact_dir)
        art.mkdir(parents=True, exist_ok=True)
        shutil.copy(Path(args.out_dir) / "run" / "metrics.jsonl", art / "metrics.jsonl")
        shutil.copy(Path(args.out_dir) / "summary.json", art / "summary.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
