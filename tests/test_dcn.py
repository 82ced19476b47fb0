"""Multi-process (DCN) data parallelism.

The reference's multi-node story is Lightning DDP (configs/trainer/ddp.yaml)
with a CPU simulation backend (ddp_sim.yaml).  Ours is jax.distributed +
a mesh spanning every process: the same jitted step, now with cross-host
collectives (Gloo on CPU — the literal ddp_sim analog; ICI/DCN on pods).

Fast tests cover the batcher's process-shard mode (globally agreed bucket
shapes, local row slices, zero-weight padding).  The slow test launches TWO
real processes through the train CLI and checks they produce one coherent
run (cross-process gradient all-reduce, p0-only logging).
"""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

from emojivoice_tpu.config import get_preset
from emojivoice_tpu.data.dataset import BucketBatcher, TextMelDataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def filelists(tmp_path, rng):
    from scipy.io import wavfile

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    texts = ["hello there", "a second line", "third one here", "the final row",
             "five alive", "six sticks", "seven eleven"]
    for i, t in enumerate(texts):  # 7 rows → uneven final batch at bs=4
        p = wav_dir / f"u{i}.wav"
        wavfile.write(p, 22050, (rng.normal(size=22050 // 4 + 511 * i) * 0.1).astype(np.float32))
        rows.append(f"{p}|{i % 4}|{t}")
    train = tmp_path / "train.txt"
    train.write_text("\n".join(rows) + "\n")
    val = tmp_path / "val.txt"
    val.write_text("\n".join(rows[:2]) + "\n")
    return train, val


def _data_cfg(train):
    import dataclasses

    root = get_preset("tiny")
    return dataclasses.replace(root.data, train_filelist_path=str(train),
                               valid_filelist_path=str(train), batch_size=4, seed=0)


def test_process_shard_collation_agrees_globally(filelists):
    """Both processes must see identical bucket shapes and batch counts for
    every global batch, and together cover every row exactly once (plus
    zero-weight pad rows on the uneven tail)."""
    train, _ = filelists
    ds = TextMelDataset(str(train), _data_cfg(train))
    b0 = BucketBatcher(ds, 4, shuffle=False, seed=0, process_shard=(0, 2))
    b1 = BucketBatcher(ds, 4, shuffle=False, seed=0, process_shard=(1, 2))

    batches0, batches1 = list(b0), list(b1)
    assert len(batches0) == len(batches1) == 2  # 7 rows, bs 4 → 2 global batches
    total_real = 0.0
    for a, b in zip(batches0, batches1):
        assert a["x"].shape == b["x"].shape == (2, a["x"].shape[1])  # 4/2 local rows
        assert a["y"].shape == b["y"].shape  # same (bucketed) mel shape
        total_real += float(a["row_mask"].sum() + b["row_mask"].sum())
    assert total_real == 7.0  # every row exactly once, pad rows masked out


def test_process_shard_requires_divisible_batch(filelists):
    train, _ = filelists
    ds = TextMelDataset(str(train), _data_cfg(train))
    with pytest.raises(ValueError):
        BucketBatcher(ds, 5, process_shard=(0, 2))


def test_item_lengths_match_getitem(filelists):
    train, _ = filelists
    ds = TextMelDataset(str(train), _data_cfg(train))
    for j in (0, 3, 6):
        it = ds[j]
        assert ds.item_lengths(j) == (len(it["x"]), it["y"].shape[0])


@pytest.mark.slow
def test_two_process_train_cli(filelists, tmp_path):
    """Two REAL processes: jax.distributed over localhost, 2 virtual CPU
    devices each → a 4-device mesh; one fine-tune step; p0 logs metrics,
    p1 stays silent; both exit 0."""
    train, val = filelists
    out = tmp_path / "dcn_run"
    # ephemeral coordinator port: a hardcoded one collides with parallel test
    # runs or a leftover process, making jax.distributed.initialize flaky
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    runner = tmp_path / "runner.py"
    runner.write_text(textwrap.dedent(f"""
        import os, sys
        pid = int(sys.argv[1])
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, {REPO!r})
        from emojivoice_tpu.training.train import main
        raise SystemExit(main([
            "--preset", "tiny",
            "--train_filelist", {str(train)!r},
            "--valid_filelist", {str(val)!r},
            "--out_dir", {str(out)!r},
            "--batch_size", "4",
            "--max_steps", "1",
            "--val_every_steps", "0",
            "--ckpt_every_steps", "0",
            "--log_every", "1",
            "--dcn_coordinator", "localhost:{port}",
            "--dcn_num_processes", "2",
            "--dcn_process_id", str(pid),
        ]))
    """))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [subprocess.Popen([sys.executable, str(runner), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env) for i in range(2)]
    outs = [p.communicate(timeout=1500)[0] for p in procs]
    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "step 1" in outs[0]          # p0 logs
    assert "step 1" not in outs[1]      # p1 silent
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any(np.isfinite(m["loss"]) for m in metrics if m["tag"] == "train")
    # exactly one process wrote metrics (no duplicate lines)
    steps = [m["step"] for m in metrics if m["tag"] == "train"]
    assert steps.count(1) == 1
