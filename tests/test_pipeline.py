"""End-to-end pipeline + CLI tests (tiny configs for CPU speed)."""

import dataclasses

import numpy as np
import pytest

from emojivoice_tpu import config as cfglib
from emojivoice_tpu.inference.pipeline import SynthesisPipeline

from tests.test_models import tiny_cfg
from tests.test_vocoder import tiny_hifigan


def tiny_root():
    model = dataclasses.replace(tiny_cfg(n_spks=4), n_feats=12)
    voc = dataclasses.replace(tiny_hifigan(), num_mels=12)
    return cfglib.RootConfig(model=model, vocoder=voc)


@pytest.fixture(scope="module")
def pipe():
    return SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256), text_buckets=(64, 128)
    )


def test_single_utterance(pipe):
    res = pipe.synthesise(["hello world"], spks=[1], n_timesteps=2, seed=0)[0]
    assert res.mel.shape[1] == 12
    assert res.mel_length > 0
    assert res.wav.shape == (res.mel_length * 16,)  # tiny vocoder: ×16
    assert np.isfinite(res.wav).all()
    assert res.rtf > 0 and res.rtf_w > 0


def test_batch_all_speakers(pipe):
    """All speakers in one compiled padded-batch call (BASELINE config #2)."""
    texts = ["hi there"] * 4
    out = pipe.synthesise(texts, spks=[0, 1, 2, 3], n_timesteps=2, seed=0)
    assert len(out) == 4
    # different speakers give different audio
    n = min(out[0].wav.shape[0], out[1].wav.shape[0])
    assert n > 0
    assert not np.allclose(out[0].wav[:n], out[1].wav[:n])


def test_seed_reproducible(pipe):
    a = pipe.synthesise(["same text"], spks=[2], n_timesteps=2, seed=42)[0]
    b = pipe.synthesise(["same text"], spks=[2], n_timesteps=2, seed=42)[0]
    np.testing.assert_array_equal(a.wav, b.wav)


def test_per_row_seeds_match_direct_calls(pipe):
    """A row inside a batch with its own seed draws the same NOISE STREAM as
    the batch-1 call with that seed; outputs agree to compiler-reassociation
    level (~1e-6 — XLA compiles different reduction orders per batch shape,
    so cross-program bit-equality is not achievable).  Same-seed rows WITHIN
    one program are bit-identical; different seeds differ at waveform scale
    (reference noise semantics: flow_matching.py:51)."""
    text = "the same text in every row"
    batched = pipe.synthesise([text] * 3, spks=[2, 2, 2], n_timesteps=2, seed=[7, 8, 7])
    direct7 = pipe.synthesise([text], spks=[2], n_timesteps=2, seed=7)[0]
    direct8 = pipe.synthesise([text], spks=[2], n_timesteps=2, seed=8)[0]
    np.testing.assert_allclose(batched[0].wav, direct7.wav, atol=1e-5)
    np.testing.assert_allclose(batched[1].wav, direct8.wav, atol=1e-5)
    np.testing.assert_array_equal(batched[2].wav, batched[0].wav)  # same program + seed → bit-equal
    assert float(np.abs(batched[0].wav - batched[1].wav).max()) > 1e-3  # seeds matter


def test_per_row_seed_count_mismatch_raises(pipe):
    with pytest.raises(ValueError, match="seeds"):
        pipe.synthesise(["a", "b"], n_timesteps=2, seed=[1, 2, 3])


def test_fused_mode(pipe):
    res = pipe.synthesise(["fused program"], spks=[1], n_timesteps=2, seed=0,
                          fused=True, fused_mel_bucket=128)[0]
    assert res.wav.size == res.mel_length * 16


def test_program_cache_bounded(pipe):
    pipe.synthesise(["one"], spks=[0], n_timesteps=2, seed=0)
    n_before = len(pipe._stage_b)
    pipe.synthesise(["two"], spks=[0], n_timesteps=2, seed=1)
    assert len(pipe._stage_b) == n_before  # same buckets → no recompile


def test_unknown_language_raises(pipe):
    with pytest.raises(KeyError):
        pipe.synthesise(["hello"], spks=[0], language="xx")


def test_cli_text_mode(tmp_path, monkeypatch):
    """CLI end-to-end with random init and a tiny config."""
    from emojivoice_tpu.inference import cli as cli_mod

    root = tiny_root()
    monkeypatch.setattr(
        cli_mod,
        "_load_pipeline",
        lambda args: SynthesisPipeline.from_random(root, cleaners=("basic_cleaners",),
                                                   mel_buckets=(64, 128), text_buckets=(64,)),
    )
    rc = cli_mod.main([
        "--random_init", "--text", "hello from the cli", "--steps", "2",
        "--output_folder", str(tmp_path), "--seed", "0",
    ])
    assert rc == 0
    wavs = list(tmp_path.glob("*.wav"))
    pngs = list(tmp_path.glob("*.png"))
    npys = list(tmp_path.glob("*.npy"))
    assert len(wavs) == 1 and len(pngs) == 1 and len(npys) == 1
    from scipy.io import wavfile

    sr, data = wavfile.read(wavs[0])
    assert sr == 22050 and data.size > 0


def test_cli_file_mode_with_speakers(tmp_path, monkeypatch):
    from emojivoice_tpu.inference import cli as cli_mod

    root = tiny_root()
    monkeypatch.setattr(
        cli_mod,
        "_load_pipeline",
        lambda args: SynthesisPipeline.from_random(root, cleaners=("basic_cleaners",),
                                                   mel_buckets=(64, 128), text_buckets=(64,)),
    )
    script = tmp_path / "script.txt"
    script.write_text("first line|1\nsecond line|2\n")
    out = tmp_path / "out"
    rc = cli_mod.main(["--random_init", "--file", str(script), "--steps", "2",
                       "--output_folder", str(out), "--seed", "0", "--batched"])
    assert rc == 0
    assert len(list(out.glob("*.wav"))) == 2


def test_warmup_compiles_programs(pipe):
    n_a, n_b = len(pipe._stage_a), len(pipe._stage_b)
    pipe.warmup(n_timesteps=2)
    assert len(pipe._stage_a) >= n_a and len(pipe._stage_b) >= n_b


def test_pcm16_close_to_f32(pipe):
    a = pipe.synthesise(["pcm check"], spks=[1], n_timesteps=2, seed=0)[0]
    b = pipe.synthesise(["pcm check"], spks=[1], n_timesteps=2, seed=0, pcm16=True)[0]
    n = min(len(a.wav), len(b.wav))
    assert np.abs(a.wav[:n] - b.wav[:n]).max() < 1e-4  # 1-LSB quantization


def test_mel_only_mode(pipe):
    res = pipe.synthesise(["no vocoder"], spks=[1], n_timesteps=2, seed=0, vocode=False)[0]
    assert res.wav.size == 0 and res.mel.shape[0] == res.mel_length


def test_vocoder_backend_validated():
    """Typos and unsupported combinations fail loudly at construction, not
    at compile time deep inside pallas_call (review finding)."""
    import jax.numpy as jnp

    root = tiny_root()
    with pytest.raises(ValueError, match="vocoder_backend"):
        SynthesisPipeline.from_random(root, vocoder_backend="Pallas")
    with pytest.raises(ValueError, match="float32"):
        SynthesisPipeline.from_random(
            root, vocoder_backend="pallas", compute_dtype=jnp.bfloat16
        )
    with pytest.raises(ValueError, match="vocoder_dtype"):
        SynthesisPipeline.from_random(
            root, vocoder_backend="pallas", vocoder_dtype=jnp.bfloat16
        )


def test_vocoder_bf16_close_to_f32(pipe):
    """vocoder_dtype=bf16 (serving-throughput mode) keeps the waveform
    within bf16 conv error of the f32 path: same noise stream (noise stays
    f32), same mel, only the HiFi-GAN convs run reduced-precision.  The
    Pallas auto policy must also stand down (the fused kernel stages f32
    VMEM scratch)."""
    import jax.numpy as jnp

    bf = SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256),
        text_buckets=(64, 128), vocoder_dtype=jnp.bfloat16)
    assert not bf._pallas_voc
    f32 = pipe.synthesise(["precision check"], spks=[1], n_timesteps=2, seed=3)[0]
    b16 = bf.synthesise(["precision check"], spks=[1], n_timesteps=2, seed=3)[0]
    assert b16.wav.dtype == np.float32
    assert b16.mel_length == f32.mel_length  # acoustic path untouched
    np.testing.assert_allclose(b16.mel, f32.mel, atol=1e-5)  # mel stays f32
    n = min(len(f32.wav), len(b16.wav))
    err = np.abs(f32.wav[:n] - b16.wav[:n]).max()
    assert 0 < err < 2e-2  # bf16 convs differ, but stay at inaudible scale
