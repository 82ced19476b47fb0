"""AOT export round trip, bf16 pipeline, observability utils."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.inference.export import ExportedSynthesizer, export_synthesis
from emojivoice_tpu.inference.pipeline import SynthesisPipeline

from tests.test_pipeline import tiny_root


@pytest.fixture(scope="module")
def pipe():
    return SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128), text_buckets=(64,)
    )


def test_export_roundtrip(pipe, tmp_path):
    path = export_synthesis(pipe, str(tmp_path / "model"), text_bucket=64, mel_bucket=64,
                            n_timesteps=2)
    assert path.exists()
    meta = json.loads((tmp_path / "model.json").read_text())
    assert meta["n_timesteps"] == 2 and meta["with_vocoder"]

    synth = ExportedSynthesizer(str(tmp_path / "model"))
    x = np.zeros((1, 64), np.int32)
    x[0, :11] = [0, 50, 0, 51, 0, 52, 0, 53, 0, 54, 0]
    wav, mel_lengths = synth(x, [11], [1], seed=3)
    assert wav.shape[0] == 1 and np.isfinite(wav).all()
    assert int(mel_lengths[0]) > 0

    # matches the live pipeline program for the same inputs + seed
    fn = pipe._get_fused(64, 64, 1, 2, True, keep_mel=False)
    live = fn(pipe.params, pipe.vocoder_params, jnp.asarray(x), jnp.asarray([11]),
              jnp.asarray([1]), jnp.float32(1.0), jnp.float32(0.667),
              jax.random.PRNGKey(3), jnp.float32(0.00025))
    np.testing.assert_allclose(wav[0], np.asarray(live["wav"])[0], atol=1e-5)


def test_bf16_pipeline_close_to_f32():
    kw = dict(cleaners=("basic_cleaners",), mel_buckets=(64, 128), text_buckets=(64,))
    p16 = SynthesisPipeline.from_random(tiny_root(), compute_dtype=jnp.bfloat16, **kw)
    p32 = SynthesisPipeline.from_random(tiny_root(), **kw)
    r16 = p16.synthesise(["hello bf16"], spks=[1], n_timesteps=2, seed=0)[0]
    r32 = p32.synthesise(["hello bf16"], spks=[1], n_timesteps=2, seed=0)[0]
    assert r16.wav.dtype == np.float32  # cast back at the boundary
    assert abs(r16.mel_length - r32.mel_length) <= 2
    ml = min(r16.mel_length, r32.mel_length)
    mae = float(np.abs(r16.mel[:ml] - r32.mel[:ml]).mean())
    assert mae < 0.1, mae  # same sample stream, bf16 rounding only


def test_observability_utils(tmp_path):
    from emojivoice_tpu.utils.observability import (
        StepTimer,
        TensorBoardWriter,
        is_main_process,
        main_process_only,
        seed_everything,
    )

    key = seed_everything(7)
    assert key.shape == (2,)
    assert is_main_process()

    calls = []
    main_process_only(lambda: calls.append(1))()
    assert calls == [1]

    timer = StepTimer()
    x = jnp.ones((64, 64))
    with timer.measure(x):
        y = x @ x
    with timer.measure(y):
        y = x @ x
    s = timer.summary()
    assert s["n"] == 2 and s["median_s"] >= 0

    w = TensorBoardWriter(str(tmp_path / "tb"))
    w.scalar("loss", 1.5, step=1)
    w.image("mel", np.random.default_rng(0).normal(size=(80, 100)), step=1)
    w.flush()
    lines = (tmp_path / "tb" / "scalars.jsonl").read_text().splitlines()
    assert json.loads(lines[0])["value"] == 1.5
