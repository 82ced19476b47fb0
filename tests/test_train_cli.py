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
        "--max_steps", "3",
        "--val_every_steps", "2",
        "--ckpt_every_steps", "2",
        "--log_every", "1",
        "--num_devices", "2",
        "--render_val_samples", "1",
    ])
    assert rc == 0
    metrics = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    train_metrics = [m for m in metrics if m["tag"] == "train"]
    val_metrics = [m for m in metrics if m["tag"] == "val"]
    assert len(train_metrics) >= 3
    assert len(val_metrics) >= 1
    assert all(np.isfinite(m["loss"]) for m in train_metrics)
    # checkpoint + config written
    assert (out / "ckpts" / "config.json").exists()
    # validation sample rendered
    assert list((out / "tb").glob("val_mel_0_*.png"))

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
