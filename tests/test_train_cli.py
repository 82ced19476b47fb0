"""End-to-end train CLI smoke: tiny preset, synthetic wavs, resume."""

import json
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow



@pytest.fixture
def dataset(tmp_path, rng):
    from scipy.io import wavfile

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    texts = ["hello there", "a second utterance", "one more line", "and the last one"]
    for i, text in enumerate(texts):
        wav = (rng.normal(size=22050 // 4 + i * 1024) * 0.1).astype(np.float32)
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, 22050, wav)
        rows.append(f"{path}|{i % 4}|{text}")
    train = tmp_path / "train.txt"
    train.write_text("\n".join(rows) + "\n")
    val = tmp_path / "val.txt"
    val.write_text(rows[0] + "\n")
    return train, val, tmp_path


def test_train_cli_end_to_end(dataset):
    from emojivoice_tpu.training.train import main

    train, val, tmp = dataset
    out = tmp / "run"
    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(out),
        "--batch_size", "2",
        # max_steps a multiple of ckpt_every_steps: the run ends on a step the
        # periodic save already wrote — the final save_last must skip it
        # (orbax StepAlreadyExistsError regression)
        "--max_steps", "4",
        "--val_every_steps", "2",
        "--ckpt_every_steps", "2",
        "--log_every", "1",
        "--num_devices", "2",
        "--render_val_samples", "1",
        "--test_filelist", str(val),  # post-fit test pass (trainer.test analog)
        "--loggers", "tensorboard,csv",   # logger-backend choice (configs/logger/*.yaml analog)
        "--probe_every", "2",             # alignment-emergence diagnostics cadence
    ])
    assert rc == 0
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    train_metrics = [m for m in metrics if m["tag"] == "train"]
    val_metrics = [m for m in metrics if m["tag"] == "val"]
    test_metrics = [m for m in metrics if m["tag"] == "test"]
    assert len(train_metrics) >= 3
    assert len(val_metrics) >= 1
    # exactly one post-fit test record, at the final step, finite
    assert len(test_metrics) == 1 and test_metrics[0]["step"] == 4
    assert np.isfinite(test_metrics[0]["loss"])
    assert all(np.isfinite(m["loss"]) for m in train_metrics)
    # checkpoint + config written
    assert (out / "ckpts" / "config.json").exists()
    # validation sample rendered
    assert list((out / "tb").glob("val_mel_0_*.png"))
    # probe records: random-init baseline at step 0 plus the cadence fires,
    # each carrying the emergence metrics and the row-0 MAS duration trace
    probes = [m for m in metrics if m["tag"] == "probe"]
    assert [m["step"] for m in probes][:2] == [0, 2]
    for key in ("diagonality", "dur_mse_log", "tf_mel_l1", "mas_dur_row0"):
        assert key in probes[0]
    # first probe has no drift predecessor: strict-JSON null, never NaN
    # (jq and most non-Python parsers reject the bare NaN token)
    assert probes[0]["mas_drift_l1"] is None
    assert all(m["mas_drift_l1"] is not None for m in probes[1:])
    for line in (out / "metrics.jsonl").read_text().splitlines():
        json.loads(line, parse_constant=lambda c: pytest.fail(f"non-strict JSON token {c}"))
    # CSV logger backend wrote the wide metrics file with probe columns
    import csv as _csv
    rows = list(_csv.DictReader(open(out / "tb" / "metrics.csv")))
    assert rows and "train/loss" in rows[-1]
    assert any(r.get("probe/diagonality") for r in rows)

    # resume continues from the saved step
    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(out),
        "--batch_size", "2",
        "--max_steps", "5",
        "--val_every_steps", "0",
        "--ckpt_every_steps", "100",
        "--num_devices", "2",
        "--resume",
        "--log_every", "1",
        "--render_val_samples", "0",
    ])
    assert rc == 0
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    steps = [m["step"] for m in metrics if m["tag"] == "train"]
    assert max(steps) >= 5
    # data-order resume: the sidecar was written at the save step, and the
    # resumed step-5 loss matches a continuous 5-step run bit-for-bit — the
    # resumed run trains on the NEXT shuffle batches, not an epoch replay
    # (per-step rng is fold_in(step), so data order is the only variable)
    assert (out / "ckpts" / "data_state_4.json").exists()
    out2 = tmp / "run_continuous"
    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(out2),
        "--batch_size", "2",
        "--max_steps", "5",
        "--val_every_steps", "0",
        "--ckpt_every_steps", "100",
        "--num_devices", "2",
        "--log_every", "1",
        "--render_val_samples", "0",
    ])
    assert rc == 0
    cont = [json.loads(l) for l in (out2 / "metrics.jsonl").read_text().splitlines()]
    loss_resumed = [m for m in metrics if m["tag"] == "train" and m["step"] == 5][-1]["loss"]
    loss_cont = [m for m in cont if m["tag"] == "train" and m["step"] == 5][-1]["loss"]
    np.testing.assert_allclose(loss_resumed, loss_cont, rtol=0, atol=0)


def test_task_wrapper_writes_exception_log(tmp_path):
    """Reference task_wrapper analog (utils/utils.py:52-104): failure →
    traceback persisted in out_dir/exception.log, then re-raised."""
    from emojivoice_tpu.training.train import main

    out = tmp_path / "failrun"
    with pytest.raises(Exception):
        main([
            "--preset", "tiny",
            "--train_filelist", str(tmp_path / "does_not_exist.txt"),
            "--valid_filelist", str(tmp_path / "does_not_exist.txt"),
            "--out_dir", str(out),
        ])
    log = out / "exception.log"
    assert log.exists()
    assert "Traceback" in log.read_text()


def test_train_cli_scheduler_and_uneven_batches(dataset):
    """Cosine schedule + warmup shows a varying lr metric, and a batch size
    that does NOT divide the dataset (4 items, bs=3) trains without dropping
    the tail batch (row_mask padding path)."""
    from emojivoice_tpu.training.train import main

    train, val, tmp = dataset
    out = tmp / "run_sched"
    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(out),
        "--batch_size", "3",
        "--max_steps", "4",
        "--val_every_steps", "0",
        "--ckpt_every_steps", "0",
        "--log_every", "1",
        "--num_devices", "2",
        "--render_val_samples", "0",
        "--scheduler", "cosine",
        "--warmup_steps", "2",
        "--decay_steps", "10",
        "--lr", "1e-3",
    ])
    assert rc == 0
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    train_metrics = [m for m in metrics if m["tag"] == "train"]
    # 4 items / bs 3 → 2 batches per epoch (one padded), 2 epochs → 4 steps
    assert len(train_metrics) == 4
    lrs = [m["lr"] for m in train_metrics]
    # linear warmup over 2 steps from 0 (lr logged pre-update at steps 0,1),
    # peak at step 2, cosine decay after
    assert lrs[0] < lrs[1] < lrs[2]
    np.testing.assert_allclose(lrs[2], 1e-3, rtol=1e-5)
    assert lrs[3] < lrs[2]
    assert all(np.isfinite(m["loss"]) for m in train_metrics)


def test_make_schedule_shapes():
    from emojivoice_tpu.config import OptimizerConfig
    from emojivoice_tpu.training.state import make_schedule

    const = make_schedule(OptimizerConfig())
    assert const == 1e-4
    exp = make_schedule(OptimizerConfig(scheduler="exponential", decay_steps=100,
                                        scheduler_gamma=0.5))
    np.testing.assert_allclose(float(exp(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(exp(100)), 5e-5, rtol=1e-6)
    cos = make_schedule(OptimizerConfig(scheduler="cosine", decay_steps=100, lr_end=1e-5))
    np.testing.assert_allclose(float(cos(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(cos(100)), 1e-5, rtol=1e-6)
    warm = make_schedule(OptimizerConfig(scheduler="cosine", warmup_steps=10, decay_steps=100))
    assert float(warm(0)) == 0.0
    np.testing.assert_allclose(float(warm(10)), 1e-4, rtol=1e-6)


def test_steps_per_dispatch_matches_per_step_run(tmp_path, dataset):
    """--steps_per_dispatch 4 (K-step lax.scan chunks, partial chunks padded
    with masked sub-steps) reproduces the K=1 run's train metrics at the
    same steps and fires val at the same cadence boundary."""
    from emojivoice_tpu.training.train import main

    train, val, _ = dataset

    def run(tag, extra):
        out = tmp_path / tag
        rc = main([
            "--preset", "tiny", "--train_filelist", str(train),
            "--valid_filelist", str(val), "--out_dir", str(out),
            "--batch_size", "2", "--max_steps", "6", "--num_devices", "2",
            "--val_every_steps", "4", "--log_every", "2", "--seed", "0"] + extra)
        assert rc == 0, tag
        return [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]

    r1 = run("k1", [])
    r4 = run("k4", ["--steps_per_dispatch", "4"])
    t1 = [(r["step"], r["loss"]) for r in r1 if r["tag"] == "train"]
    t4 = [(r["step"], r["loss"]) for r in r4 if r["tag"] == "train"]
    assert [s for s, _ in t1] == [s for s, _ in t4] and t1
    for (s, a), (_, b) in zip(t1, t4):
        np.testing.assert_allclose(b, a, rtol=1e-3, err_msg=f"step {s}")
    assert [r["step"] for r in r1 if r["tag"] == "val"] == \
           [r["step"] for r in r4 if r["tag"] == "val"] == [4]


def test_train_to_audio_proof_tiny(tmp_path):
    """The fine-tune-from-torch-ckpt → N-step train → serve-audio proof loop
    (emojivoice_tpu.training.proof) at tiny scale; the committed flagship-run
    evidence lives in docs/artifacts/train_proof/."""
    from emojivoice_tpu.training.proof import run_proof

    # log_every=2 exercises the pipelined-metrics cadence (records at every
    # Nth step only), the steady state of real TPU runs
    s = run_proof("tiny", str(tmp_path / "proof"), steps=16, batch_size=4,
                  num_devices=2, out_size=100, utts=8, log_every=2)
    assert s["loss_drop"] > 0
    assert s["steps"] == 16
    assert (tmp_path / "proof" / "proof.wav").exists()


def test_overfit_batches_repeats_the_same_batches(dataset, monkeypatch):
    """--overfit_batches N trains on the SAME N batches every epoch — the
    can-it-memorize check is meaningless if each epoch reshuffles and slices
    N different ones."""
    import emojivoice_tpu.parallel.mesh as pmesh
    import emojivoice_tpu.training.train as tr

    train, val, tmp = dataset
    seen = []
    orig = pmesh.shard_batch

    def spy(mesh, batch):
        seen.append(batch["x"].tobytes())
        return orig(mesh, batch)

    # train.main imports shard_batch at call time, so patch the source module
    monkeypatch.setattr(pmesh, "shard_batch", spy)
    rc = tr.main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(tmp / "overfit_run"),
        "--batch_size", "2",
        "--overfit_batches", "2",
        "--max_epochs", "2",
        "--val_every_steps", "0",
        "--ckpt_every_steps", "0",
        "--log_every", "1",
    ])
    assert rc == 0
    # two epochs × two batches, second epoch repeats the first byte-for-byte
    assert len(seen) == 4
    assert seen[2:] == seen[:2]


def test_fast_dev_run_writes_no_checkpoint(dataset):
    from emojivoice_tpu.training.train import main

    train, val, tmp = dataset
    out = tmp / "fdr_run"
    rc = main([
        "--preset", "tiny",
        "--train_filelist", str(train),
        "--valid_filelist", str(val),
        "--out_dir", str(out),
        "--batch_size", "2",
        "--fast_dev_run",
    ])
    assert rc == 0
    ckpts = out / "ckpts"
    assert not ckpts.exists() or not any(ckpts.iterdir())
