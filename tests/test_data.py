"""Data pipeline: numpy/jax mel parity, dataset, bucketing collate, stats."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.config import AudioConfig, DataConfig, DataStatistics
from emojivoice_tpu.data.audio_np import load_wav, mel_spectrogram_np, resample_poly_np
from emojivoice_tpu.data.dataset import BucketBatcher, Prefetcher, TextMelDataset, parse_filelist
from emojivoice_tpu.ops.mel import mel_spectrogram


def test_mel_np_matches_jax(rng):
    y = (rng.normal(size=(256 * 12,)) * 0.1).astype(np.float32)
    a = mel_spectrogram_np(y)
    b = np.asarray(mel_spectrogram(jnp.asarray(y[None])))[0]
    assert a.shape == b.shape == (12, 80)
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_resample_poly():
    t = np.arange(44100) / 44100
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_poly_np(y, 44100, 22050)
    assert abs(len(out) - 22050) <= 1
    # frequency preserved: zero crossings ≈ 880 per second
    zc = np.sum(np.abs(np.diff(np.signbit(out[1000:21000]))))
    assert 750 < zc < 850 * 22000 / 20000


@pytest.fixture
def wav_dataset(tmp_path, rng):
    from scipy.io import wavfile

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    entries = []
    for i, (text, spk) in enumerate([("hello there", 0), ("goodbye now", 1), ("a longer sentence here", 2)]):
        n = 22050 // 2 + i * 2048
        wav = (rng.normal(size=n) * 0.1).astype(np.float32)
        path = wav_dir / f"utt{i}.wav"
        wavfile.write(path, 22050, wav)
        entries.append(f"{path}|{spk}|{text}")
    filelist = tmp_path / "train.txt"
    filelist.write_text("\n".join(entries) + "\n")
    cfg = DataConfig(
        cleaners=("basic_cleaners",),
        n_spks=3,
        audio=AudioConfig(),
        data_statistics=DataStatistics(mel_mean=-5.5, mel_std=2.0),
    )
    return str(filelist), cfg


def test_parse_filelist(wav_dataset):
    filelist, _ = wav_dataset
    rows = parse_filelist(filelist)
    assert len(rows) == 3 and len(rows[0]) == 3


def test_dataset_item(wav_dataset):
    filelist, cfg = wav_dataset
    ds = TextMelDataset(filelist, cfg)
    assert len(ds) == 3
    item = ds[0]
    assert item["x"].dtype == np.int32
    assert item["x"][0] == 0 and item["x"][2] == 0  # interspersed blanks
    assert item["y"].ndim == 2 and item["y"].shape[1] == 80
    assert 0 <= item["spk"] < 3
    # normalized mel should be roughly zero-centered for silence-ish noise
    assert np.isfinite(item["y"]).all()


def test_dataset_rejects_out_of_range_speaker(wav_dataset, tmp_path):
    """A filelist speaker id >= n_spks must fail loudly at load: flax
    nn.Embed fills out-of-range lookups with NaN under jit, which would
    otherwise surface only as loss=nan at step 1 (torch nn.Embedding, the
    reference path, raises IndexError)."""
    filelist, cfg = wav_dataset
    rows = open(filelist).read().splitlines()
    bad = tmp_path / "bad.txt"
    p, _, t = rows[0].split("|")
    bad.write_text("\n".join(rows + [f"{p}|7|{t}"]) + "\n")
    with pytest.raises(ValueError, match=r"speaker id 7 .* outside \[0, 3\)"):
        TextMelDataset(str(bad), cfg)


def test_dataset_cache_items(wav_dataset, monkeypatch):
    """cache_items=True decodes each wav exactly once and returns identical
    content on later epochs (the reference re-decodes every epoch behind 20
    DataLoader workers, text_mel_datamodule.py:96-98; this host has 1 core)."""
    import emojivoice_tpu.data.dataset as dsmod

    filelist, cfg = wav_dataset
    calls = {"n": 0}
    real = dsmod.load_wav

    def counting_load(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(dsmod, "load_wav", counting_load)
    ds = TextMelDataset(filelist, cfg, cache_items=True)
    first = [ds[i] for i in range(len(ds))]
    assert calls["n"] == len(ds)
    second = [ds[i] for i in range(len(ds))]
    assert calls["n"] == len(ds)  # no re-decode
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y"], b["y"])
    # default stays uncached (LJSpeech-scale corpora must not be pinned)
    ds2 = TextMelDataset(filelist, cfg)
    _ = ds2[0], ds2[0]
    assert calls["n"] == len(ds) + 2


def test_bucket_batcher(wav_dataset):
    filelist, cfg = wav_dataset
    ds = TextMelDataset(filelist, cfg)
    batches = list(BucketBatcher(ds, batch_size=2, text_buckets=(64, 128), mel_buckets=(64, 128, 256)))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["x"].shape[1] in (64, 128)
    assert b0["y"].shape[1] in (64, 128, 256)
    assert (b0["y_lengths"] <= b0["y"].shape[1]).all()
    assert (b0["x_lengths"] <= b0["x"].shape[1]).all()
    # masked region must be zero
    i = 0
    assert b0["y"][i, b0["y_lengths"][i]:, :].sum() == 0


def test_bucket_batcher_min_mel(wav_dataset):
    filelist, cfg = wav_dataset
    ds = TextMelDataset(filelist, cfg)
    b = next(iter(BucketBatcher(ds, 3, mel_buckets=(64, 128, 256), min_mel_bucket=172)))
    assert b["y"].shape[1] >= 172


def test_bucket_batcher_skip_next_resumes_order(wav_dataset):
    """skip_next fast-forwards WITHIN the deterministic shuffle: a batcher
    restored to (epoch E, batch k) yields exactly what a continuous run
    yields from that point (the train loop's data-order resume)."""
    filelist, cfg = wav_dataset
    ds = TextMelDataset(filelist, cfg)

    def key(b):
        return (tuple(b["spks"].tolist()), tuple(b["x_lengths"].tolist()))

    cont = BucketBatcher(ds, batch_size=1, seed=7)
    seen = [key(b) for b in cont] + [key(b) for b in cont]  # two epochs

    resumed = BucketBatcher(ds, batch_size=1, seed=7)
    resumed.epoch = 0
    resumed.skip_next = 2  # as if 2 batches of epoch 0 were consumed
    tail = [key(b) for b in resumed] + [key(b) for b in resumed]
    assert tail == seen[2:]
    assert resumed.skip_next == 0  # one-shot

    # skipping a whole epoch yields nothing and advances to the next epoch
    whole = BucketBatcher(ds, batch_size=1, seed=7)
    whole.skip_next = len(ds)
    assert list(whole) == []
    assert whole.epoch == 1


def test_prefetcher(wav_dataset):
    filelist, cfg = wav_dataset
    ds = TextMelDataset(filelist, cfg)
    batcher = BucketBatcher(ds, batch_size=1)
    assert len(list(Prefetcher(batcher))) == 3


def test_data_stats(wav_dataset):
    from emojivoice_tpu.data.stats import compute_data_statistics

    filelist, cfg = wav_dataset
    stats = compute_data_statistics(filelist, cfg)
    assert -15 < stats["mel_mean"] < 0
    assert 0 < stats["mel_std"] < 10


def test_load_wav_int16(tmp_path):
    from scipy.io import wavfile

    path = tmp_path / "a.wav"
    wavfile.write(path, 22050, (np.ones(100) * 16384).astype(np.int16))
    wav, sr = load_wav(str(path))
    assert sr == 22050
    np.testing.assert_allclose(wav, 0.5, atol=1e-4)


def test_prefetcher_abandoned_consumer_releases_worker():
    """Breaking out of a Prefetcher-wrapped loop (max_steps/limit_batches in
    the train loop) must stop the background thread — an unbounded q.put
    would strand it forever, pinning buffered batches."""
    import threading
    import time

    from emojivoice_tpu.data.dataset import Prefetcher

    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    before = threading.active_count()
    it = iter(Prefetcher(gen(), depth=2))
    assert next(it) == 0
    it.close()  # what an abandoned for-loop does at GC time
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before and time.monotonic() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before  # worker exited
    assert len(produced) < 100  # and stopped consuming the source
