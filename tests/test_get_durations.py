"""Duration-extraction tool end-to-end + load_durations training path."""

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np
import torch

from emojivoice_tpu.config import OptimizerConfig, get_preset
from emojivoice_tpu.io.torch_ckpt import export_matcha_state_dict
from emojivoice_tpu.training import create_train_state


def test_get_durations_cli(tmp_path, rng):
    from scipy.io import wavfile

    # tiny wav dataset matching the 'tiny' preset (4 speakers)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, text in enumerate(["hello there", "good morning"]):
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, 22050, (rng.normal(size=8192) * 0.1).astype(np.float32))
        rows.append(f"{path}|{i}|{text}")
    filelist = tmp_path / "train.txt"
    filelist.write_text("\n".join(rows) + "\n")

    # tiny model exported to a torch checkpoint
    root = get_preset("tiny")
    state = create_train_state(root.model, OptimizerConfig(), seed=0)
    sd = export_matcha_state_dict(jax.device_get(state.params), root.model)
    ckpt = tmp_path / "tiny.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}},
               ckpt)

    from emojivoice_tpu.training.get_durations import main

    out_dir = tmp_path / "durs"
    rc = main(["--checkpoint_path", str(ckpt), "--filelist", str(filelist),
               "--preset", "tiny", "--output_dir", str(out_dir), "--batch_size", "2"])
    assert rc == 0

    npys = sorted((out_dir / "durations").glob("*.npy"))
    jsons = sorted((out_dir / "durations").glob("*.json"))
    assert len(npys) == 2 and len(jsons) == 2
    durs = np.load(npys[0])
    assert durs.ndim == 1 and durs.sum() > 0
    spans = json.loads(jsons[0].read_text())
    # spans are contiguous and cover the mel length
    ends = [v["endtime"] for v in spans.values()]
    starts = [v["starttime"] for v in spans.values()]
    assert starts[0] == 0
    assert all(e == s for e, s in zip(ends[:-1], starts[1:]))


def test_get_phoneme_durations_blank_merge():
    from emojivoice_tpu.training.get_durations import get_phoneme_durations

    # interleaved: blank,d0, phone,d1, blank,d2, phone,d3, blank,d4
    durations = [2, 5, 1, 4, 3]
    phones = ["a", "b"]
    spans = get_phoneme_durations(durations, phones)
    assert spans["a_0"]["duration"] == 7  # 2 (leading blank) + 5
    assert spans["b_1"]["duration"] == 8  # 1 + 4 + trailing 3
    assert spans["b_1"]["endtime"] == 15  # == sum(durations)


def test_load_durations_training_path(tmp_path, rng):
    """durations/*.npy → dataset load_durations → training with
    use_precomputed_durations (generate_path instead of MAS)."""
    from scipy.io import wavfile

    from emojivoice_tpu.data.dataset import BucketBatcher, TextMelDataset
    from emojivoice_tpu.training import make_train_step

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rows = []
    for i, text in enumerate(["hello there", "good morning"]):
        path = wav_dir / f"u{i}.wav"
        wavfile.write(path, 22050, (rng.normal(size=8192) * 0.1).astype(np.float32))
        rows.append(f"{path}|{i}|{text}")
    filelist = tmp_path / "train.txt"
    filelist.write_text("\n".join(rows) + "\n")

    root = get_preset("tiny")
    data_cfg = dataclasses.replace(root.data, load_durations=True)
    # fabricate durations summing to the true mel frame count
    (tmp_path / "durations").mkdir()
    probe = TextMelDataset(filelist, dataclasses.replace(root.data, load_durations=False))
    for path, spk, text in probe.items:
        item = [it for it in (probe[j] for j in range(len(probe))) if it["filepath"] == path][0]
        n_tok, n_frames = len(item["x"]), item["y"].shape[0]
        durs = np.zeros(n_tok, np.float32)
        base = n_frames // n_tok
        durs[:] = base
        durs[-1] += n_frames - base * n_tok
        np.save(tmp_path / "durations" / f"{Path(path).stem}.npy", durs)

    ds = TextMelDataset(filelist, data_cfg)
    batch = next(iter(BucketBatcher(ds, 2, shuffle=False)))
    assert "durations" in batch

    model_cfg = dataclasses.replace(root.model, use_precomputed_durations=True)
    state = create_train_state(model_cfg, OptimizerConfig(), seed=0)
    step = make_train_step(model_cfg, OptimizerConfig())
    import jax.numpy as jnp

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, jbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
