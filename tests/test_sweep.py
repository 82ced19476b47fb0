"""emojivoice-sweep — the Hydra multirun / Optuna-sweeper analog
(reference: Matcha-TTS/configs/hparams_search/mnist_optuna.yaml:1-52)."""

import json

import numpy as np
import pytest

from emojivoice_tpu.training.sweep import (
    build_trials,
    main,
    parse_space,
    read_objective,
    run_sweep,
)


def test_parse_space_kinds():
    s = parse_space("scheduler=choice:constant,cosine")
    assert s.kind == "choice" and s.choices == ["constant", "cosine"]
    s = parse_space("lr=log:1e-5:1e-3")
    assert s.kind == "log" and (s.lo, s.hi) == (1e-5, 1e-3)
    s = parse_space("out_size=int:172:344")
    assert s.kind == "int"
    with pytest.raises(ValueError):
        parse_space("nokind")
    with pytest.raises(ValueError):
        parse_space("lr=log:0:1")  # log-uniform needs lo > 0
    with pytest.raises(ValueError):
        parse_space("x=weird:1:2")


def test_build_trials_grid_and_random():
    spaces = [parse_space("a=choice:1,2"), parse_space("b=choice:x,y,z")]
    grid = build_trials(spaces, grid=True, trials=0, seed=0)
    assert len(grid) == 6 and {"a": "1", "b": "x"} in grid
    # continuous spaces cannot grid
    with pytest.raises(ValueError):
        build_trials([parse_space("lr=log:1e-5:1e-3")], grid=True, trials=0, seed=0)
    rng_trials = build_trials(
        [parse_space("lr=log:1e-5:1e-3"), parse_space("n=int:1:4")],
        grid=False, trials=16, seed=7)
    assert len(rng_trials) == 16
    lrs = [t["lr"] for t in rng_trials]
    assert all(1e-5 <= v <= 1e-3 for v in lrs)
    assert all(t["n"] in (1, 2, 3, 4) for t in rng_trials)
    # deterministic under the seed
    assert rng_trials == build_trials(
        [parse_space("lr=log:1e-5:1e-3"), parse_space("n=int:1:4")],
        grid=False, trials=16, seed=7)


def test_read_objective_last_tag_wins_and_train_fallback(tmp_path):
    run = tmp_path / "run"
    run.mkdir()
    rows = [
        {"tag": "train", "step": 1, "loss": 5.0},
        {"tag": "val", "step": 2, "loss": 3.0},
        {"tag": "train", "step": 3, "loss": 4.0},
        {"tag": "val", "step": 4, "loss": 2.5},
    ]
    (run / "metrics.jsonl").write_text("\n".join(json.dumps(r) for r in rows))
    assert read_objective(run, "val/loss") == 2.5
    assert read_objective(run, "test/loss") == 4.0  # tag absent → train fallback
    assert read_objective(tmp_path / "nope", "val/loss") is None


def test_run_sweep_ranks_and_survives_failures(tmp_path):
    """Trial isolation: a crashing trial is recorded and the sweep
    continues, like Optuna's failed-trial handling."""

    def fake_train(argv):
        out = argv[argv.index("--out_dir") + 1]
        lr = float(argv[argv.index("--lr") + 1])
        if lr > 1e-2:
            raise RuntimeError("diverged")
        from pathlib import Path

        p = Path(out)
        p.mkdir(parents=True, exist_ok=True)
        (p / "metrics.jsonl").write_text(
            json.dumps({"tag": "val", "step": 1, "loss": lr * 100}) + "\n")
        return 0

    trials = [{"lr": 1e-4}, {"lr": 0.5}, {"lr": 1e-3}]
    summary = run_sweep(trials, tmp_path / "sweep", ["--ignored"],
                        train_main=fake_train)
    assert summary["n_trials"] == 3 and summary["n_failed"] == 1
    assert summary["best"]["trial"] == 0  # smallest lr → smallest loss
    assert [r["trial"] for r in summary["ranking"]] == [0, 2]
    # jsonl log has one strict-JSON line per trial incl. the failure
    lines = (tmp_path / "sweep" / "trials.jsonl").read_text().splitlines()
    assert len(lines) == 3
    recs = [json.loads(l) for l in lines]
    assert recs[1]["status"].startswith("error: RuntimeError")
    assert (tmp_path / "sweep" / "trial_001" / "sweep_error.log").exists()
    assert (tmp_path / "sweep" / "summary.json").exists()


@pytest.fixture
def dataset(tmp_path, rng):
    from scipy.io import wavfile

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, text in enumerate(["hello there", "a second utterance"]):
        wav = (rng.normal(size=22050 // 4) * 0.1).astype(np.float32)
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, 22050, wav)
        rows.append(f"{path}|{i}|{text}")
    train = tmp_path / "train.txt"
    train.write_text("\n".join(rows) + "\n")
    return train


@pytest.mark.slow
def test_sweep_cli_end_to_end_tiny(dataset, tmp_path):
    """A real 2-trial grid over the actual training CLI at tiny dims."""
    out = tmp_path / "sweep"
    rc = main([
        "--out_dir", str(out),
        "--grid",
        "--space", "lr=choice:1e-4,1e-3",
        "--objective", "val/loss",
        "--",
        "--preset", "tiny",
        "--train_filelist", str(dataset),
        "--valid_filelist", str(dataset),
        "--batch_size", "2",
        "--max_steps", "2",
        "--val_every_steps", "2",
        "--ckpt_every_steps", "100",
        "--log_every", "1",
        "--num_devices", "1",
        "--render_val_samples", "0",
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["n_trials"] == 2 and summary["n_failed"] == 0
    assert summary["best"] is not None
    assert {r["params"]["lr"] for r in summary["ranking"]} == {"1e-4", "1e-3"}
    # each trial has its own run dir with metrics
    assert (out / "trial_000" / "metrics.jsonl").exists()
    assert (out / "trial_001" / "metrics.jsonl").exists()
