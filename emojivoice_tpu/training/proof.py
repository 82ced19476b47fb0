"""`python -m emojivoice_tpu.training.proof` — train-to-audio proof run.

End-to-end evidence that the fine-tune story works beyond a 1-step smoke
(reference story: /README.md:145-162 — fine-tune a released multi-speaker
checkpoint on ~2 min per emoji voice, then synthesise with the new voices):

1. build a model at the requested preset and export it through the
   torch-format writer — a surrogate for a released PyTorch checkpoint
   (the real ones are not in this image), exercising the exact
   ``--from_torch_ckpt`` load path;
2. generate a synthetic 22.05 kHz fine-tune dataset (distinct harmonic
   signatures per speaker id, the 11 emoji voices by default);
3. run the real training CLI for N steps;
4. assert the train loss actually decreased (first-window vs last-window
   means) — not just that steps ran;
5. reload the trained checkpoint through the serving path
   (SynthesisPipeline.from_orbax) and synthesise audio with an emoji voice.

The committed artifact of the flagship run lives in
docs/artifacts/train_proof/ (metrics.jsonl + summary).
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path

import numpy as np

EMOJI_SPEAKERS = (107, 58, 79, 103, 66, 18, 12, 15, 54, 22, 17)  # feel_me.py:84-96


def make_dataset(root: Path, n_spks_pool, n_utts: int = 22, seconds: float = 2.0,
                 sample_rate: int = 22050, seed: int = 0):
    """Synthetic fine-tune corpus: per-speaker harmonic stacks + breath noise."""
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    wav_dir = root / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    texts = [
        "the robot tells a story", "a brave little voice", "hello from the island",
        "we walk to the harbor", "rain falls on the roof", "the kettle sings softly",
        "count the silver stars", "a door creaks open", "waves brush the sand",
        "morning light arrives", "the garden smells green", "night settles gently",
    ]
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    rows = []
    for i in range(n_utts):
        spk = n_spks_pool[i % len(n_spks_pool)]
        f0 = 110.0 * (1 + (spk % 13) / 6.0) * (1 + 0.05 * rng.normal())
        wav = sum((0.35 / h) * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
                  for h in (1, 2, 3, 4))
        wav = (wav * (0.6 + 0.4 * np.sin(2 * np.pi * 1.3 * t)) +
               0.01 * rng.normal(size=t.shape)).astype(np.float32)
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, sample_rate, wav)
        rows.append(f"{path}|{spk}|{texts[i % len(texts)]}")
    train = root / "train.txt"
    train.write_text("\n".join(rows) + "\n")
    val = root / "val.txt"
    val.write_text("\n".join(rows[:2]) + "\n")
    return train, val


def run_proof(preset: str, out_dir: str, steps: int = 40, batch_size: int = 4,
              num_devices: int = 2, out_size: int = 172, seed: int = 0,
              window: int = 5, utts: int = 22, val_every_steps: int = 0,
              ckpt_every_steps: int = 0, render_val_samples: int = 0,
              use_compilation_cache: bool = False, log_every: int = 1,
              steps_per_dispatch: int = 1, wire_f16: bool = False) -> dict:
    import jax

    if use_compilation_cache:  # TPU runs: remote compiles take minutes
        from emojivoice_tpu.config import enable_compilation_cache

        enable_compilation_cache()

    from emojivoice_tpu import config as cfglib
    from emojivoice_tpu.io.checkpoint import CheckpointManager
    from emojivoice_tpu.io.export_torch import export
    from emojivoice_tpu.training import create_train_state
    from emojivoice_tpu.training.train import main as train_main

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # 1. torch-format surrogate of a released checkpoint
    root_cfg = cfglib.get_preset(preset)
    state = create_train_state(root_cfg.model, root_cfg.optimizer, seed=seed)
    surrogate_dir = out / "surrogate_ckpts"
    mgr = CheckpointManager(str(surrogate_dir))
    mgr.save(0, jax.device_get({"params": state.params, "opt_state": state.opt_state,
                                "step": state.step}), cfg=root_cfg, force=True)
    mgr.close()
    del state
    torch_ckpt = export(str(surrogate_dir), str(out / "surrogate.ckpt"))

    # 2. synthetic 22.05 kHz fine-tune data over the emoji speaker ids
    pool = EMOJI_SPEAKERS if root_cfg.model.n_spks > max(EMOJI_SPEAKERS) else \
        tuple(range(root_cfg.model.n_spks))
    train_fl, val_fl = make_dataset(out / "data", pool, n_utts=utts, seed=seed)

    # 3. the real training CLI, fine-tuning from the torch surrogate
    run_dir = out / "run"
    rc = train_main([
        "--preset", preset,
        "--train_filelist", str(train_fl),
        "--valid_filelist", str(val_fl),
        "--out_dir", str(run_dir),
        "--batch_size", str(batch_size),
        "--max_steps", str(steps),
        "--num_devices", str(num_devices),
        "--from_torch_ckpt", str(torch_ckpt),
        "--out_size", str(out_size),
        "--val_every_steps", str(val_every_steps),
        "--ckpt_every_steps", str(ckpt_every_steps),
        # log_every 1 gives a per-step loss curve but syncs the device every
        # step (a tunnel RTT each on remote TPUs); larger values let the
        # train loop pipeline dispatches for honest throughput numbers
        "--log_every", str(log_every),
        "--render_val_samples", str(render_val_samples),
        "--seed", str(seed),
        # proof data is always fine-tune scale (tens of utterances) — cache
        # decoded mels so epochs >= 2 don't pay host-side mel extraction
        "--cache_data",
        "--steps_per_dispatch", str(steps_per_dispatch),
    ] + (["--wire_f16"] if wire_f16 else []))
    assert rc == 0, "training CLI failed"

    # 4. losses decreased — windowed means, not a smoke check
    metrics = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    train_losses = [m["loss"] for m in metrics if m["tag"] == "train"]
    # with log_every > 1 only every Nth step is a record, and the run can end
    # up to log_every-1 steps past the last record
    expected_recs = max(1, steps // log_every)
    assert len(train_losses) >= expected_recs, \
        f"expected >={expected_recs} train records for {steps} steps " \
        f"(log_every={log_every}), saw {len(train_losses)}"
    first = float(np.mean(train_losses[:window]))
    last = float(np.mean(train_losses[-window:]))
    assert last < first, f"loss did not decrease: first={first:.4f} last={last:.4f}"

    # 5. audio through the trained params via the serving path (random-init
    # vocoder — the released HiFi-GAN dumps are not in this image; the proof
    # is about the acoustic fine-tune loop)
    import jax.numpy as jnp

    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from emojivoice_tpu.vocoder import HiFiGANGenerator

    mgr = CheckpointManager(str(run_dir / "ckpts"))
    served_cfg = mgr.load_config()
    restored = mgr.restore()
    served_params = restored["params"] if "params" in restored else restored
    mgr.close()
    voc = HiFiGANGenerator(cfg=served_cfg.vocoder)
    voc_params = voc.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, served_cfg.model.n_feats)))
    pipe = SynthesisPipeline(served_cfg.model, served_params, served_cfg.vocoder, voc_params,
                             cleaners=("basic_cleaners",))
    res = pipe.synthesise(["the robot tells a story"], spks=[pool[2]], n_timesteps=10, seed=0)[0]
    wav = np.asarray(res.wav)
    assert np.isfinite(wav).all() and float(np.abs(wav).max()) > 1e-4
    from emojivoice_tpu.inference.cli import save_wav

    save_wav(str(out / "proof.wav"), wav)
    from emojivoice_tpu.inference.cli import save_png

    save_png(str(out / "proof_mel.png"), np.asarray(res.mel))

    # steps/s from the metrics timestamps (excludes the compile-bound first
    # step window only as much as the data does — honest wall rate)
    import datetime as _dt

    train_recs = [m for m in metrics if m["tag"] == "train"]
    t_first = _dt.datetime.fromisoformat(train_recs[0]["time"])
    t_last = _dt.datetime.fromisoformat(train_recs[-1]["time"])
    span = (t_last - t_first).total_seconds()
    # step-number delta, not record count: with log_every > 1 only every
    # Nth step is a record
    step_span = train_recs[-1]["step"] - train_recs[0]["step"]
    steps_per_sec = step_span / span if span > 0 else float("nan")

    val_losses = [m["loss"] for m in metrics if m["tag"] == "val"]

    summary = {
        "preset": preset, "steps": int(train_recs[-1]["step"]), "batch_size": batch_size,
        "devices": num_devices, "out_size": out_size,
        "loss_first5_mean": round(first, 4), "loss_last5_mean": round(last, 4),
        "loss_drop": round(first - last, 4),
        # explicitly the last TRAIN record — with val/test cadences on, the
        # final metrics.jsonl line is a val or test average, not a train step
        "dur_loss_last": round(train_recs[-1].get("dur_loss", float("nan")), 4),
        "diff_loss_last": round(train_recs[-1].get("diff_loss", float("nan")), 4),
        "prior_loss_last": round(train_recs[-1].get("prior_loss", float("nan")), 4),
        "steps_per_sec": round(steps_per_sec, 3),
        "val_losses": [round(v, 4) for v in val_losses],
        "val_trend_ok": bool(val_losses[-1] < val_losses[0]) if len(val_losses) >= 2 else None,
        "audio_seconds": round(len(wav) / res.sample_rate, 2),
        "backend": jax.default_backend(),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))
    return summary


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="emojivoice-train-proof")
    p.add_argument("--preset", default="emoji_multi")
    p.add_argument("--out_dir", default="proof_out")
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_devices", type=int, default=2)
    p.add_argument("--out_size", type=int, default=172)
    p.add_argument("--utts", type=int, default=22)
    p.add_argument("--val_every_steps", type=int, default=0)
    p.add_argument("--ckpt_every_steps", type=int, default=0)
    p.add_argument("--render_val_samples", type=int, default=0)
    p.add_argument("--compilation_cache", action="store_true",
                   help="persistent XLA cache (TPU runs: remote compiles take minutes)")
    p.add_argument("--artifact_dir", default=None,
                   help="copy metrics.jsonl + summary.json here (committed evidence)")
    p.add_argument("--log_every", type=int, default=1,
                   help="metric cadence; 1 = per-step loss curve (syncs the "
                        "device each step), >1 lets dispatches pipeline")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="K>1 runs K optimizer steps per compiled dispatch "
                        "(lax.scan) — amortizes the tunnel round trip")
    p.add_argument("--wire_f16", action="store_true",
                   help="ship mels host→device as f16 (transfer-bound steps)")
    args = p.parse_args(argv)
    summary = run_proof(args.preset, args.out_dir, steps=args.steps,
                        batch_size=args.batch_size, num_devices=args.num_devices,
                        out_size=args.out_size, utts=args.utts,
                        val_every_steps=args.val_every_steps,
                        ckpt_every_steps=args.ckpt_every_steps,
                        render_val_samples=args.render_val_samples,
                        use_compilation_cache=args.compilation_cache,
                        log_every=args.log_every,
                        steps_per_dispatch=args.steps_per_dispatch,
                        wire_f16=args.wire_f16)
    if args.artifact_dir:
        art = Path(args.artifact_dir)
        art.mkdir(parents=True, exist_ok=True)
        shutil.copy(Path(args.out_dir) / "run" / "metrics.jsonl", art / "metrics.jsonl")
        shutil.copy(Path(args.out_dir) / "summary.json", art / "summary.json")
        for extra in ("proof.wav", "proof_mel.png"):
            src = Path(args.out_dir) / extra
            if src.exists():
                shutil.copy(src, art / extra)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
