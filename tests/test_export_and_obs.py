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


def test_export_bundle_roundtrip(pipe, tmp_path):
    """Bucketed bundle (VERDICT missing #3): manifest over
    (batch × text × mel), runner pads + picks programs via the duration
    program, results match the live pipeline on every exported shape."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    manifest = export_bundle(
        pipe, str(tmp_path / "bundle"), text_buckets=[64], mel_buckets=[64, 128],
        batches=(1, 2), n_timesteps=2,
    )
    meta = json.loads(manifest.read_text())
    assert len(meta["programs"]) == 4  # 2 batches × 1 text × 2 mel
    names = {p["synth"] for p in meta["programs"]}
    assert "synth_b2_t64_m64" in names

    bundle = LoadedBundle(str(tmp_path / "bundle"))

    # batch-1: program picked by duration, wav matches live pipeline
    results, timings = bundle.synthesise(["hello there"], spks=[1], seed=5)
    assert timings["batch"] == 1 and timings["text_bucket"] == 64
    live = pipe.synthesise(["hello there"], spks=[1], n_timesteps=2, seed=5,
                           fused=True, fused_mel_bucket=timings["mel_bucket"])[0]
    n = min(results[0]["wav"].shape[-1], live.wav.shape[-1])
    np.testing.assert_allclose(results[0]["wav"][:n], live.wav[:n], atol=1e-5)

    # more texts than the largest exported batch bucket → served in chunks
    # (the reference onnx runner takes any count via dynamic axes)
    results3, timings3 = bundle.synthesise(["a b c", "d e f", "g h i"], spks=[0, 1, 2])
    assert len(results3) == 3 and timings3["chunks"] == 2
    for r in results3:
        assert r["mel_length"] > 0 and np.isfinite(r["wav"]).all()

    # batch-2 path: pad rows trimmed, every row finite
    results2, timings2 = bundle.synthesise(["first one", "second longer text"], spks=[0, 2])
    assert timings2["batch"] == 2
    assert len(results2) == 2
    for r in results2:
        assert r["mel_length"] > 0 and np.isfinite(r["wav"]).all()


def test_bundle_per_row_seeds_reproduce_direct_calls(pipe, tmp_path):
    """Exported programs take per-row RNG keys: a text served inside a
    merged batch draws the identical noise stream as a direct batch-1 call
    with the same seed at the same mel bucket (threefry streams depend on
    element count, not leading batch dims) — the bundle keeps the serving
    engine's per-request reproducibility guarantee."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    export_bundle(pipe, str(tmp_path / "b"), text_buckets=[64],
                  mel_buckets=[128], batches=(1, 2), n_timesteps=2)
    bundle = LoadedBundle(str(tmp_path / "b"))
    assert bundle.meta["rng_per_row"] is True

    texts = ["hello there", "a different utterance"]
    merged, _ = bundle.synthesise(texts, spks=[1, 2], seed=[11, 22])
    solo_a, _ = bundle.synthesise([texts[0]], spks=[1], seed=[11])
    solo_b, _ = bundle.synthesise([texts[1]], spks=[2], seed=[22])
    # same program family, same per-row keys → same rows (XLA may compile
    # batch-1 and batch-2 programs with different reduction order: allclose)
    np.testing.assert_allclose(merged[0]["wav"], solo_a[0]["wav"], atol=1e-5)
    np.testing.assert_allclose(merged[1]["wav"], solo_b[0]["wav"], atol=1e-5)

    # int seed semantics: text k draws the stream of seed+k
    merged2, _ = bundle.synthesise(texts, spks=[1, 2], seed=7)
    solo2, _ = bundle.synthesise([texts[1]], spks=[2], seed=[8])
    np.testing.assert_allclose(merged2[1]["wav"], solo2[0]["wav"], atol=1e-5)


def test_pcm16_bundle_quantizes_on_device(pipe, tmp_path):
    """pcm16 export quantizes the wav to int16 in-graph (same op as the live
    fused path's pcm16 mode, pipeline.py), halving the device→host payload;
    samples match the f32 bundle after host-side quantization to 1 LSB."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    export_bundle(pipe, str(tmp_path / "f32"), text_buckets=[64],
                  mel_buckets=[128], batches=(1,), n_timesteps=2)
    export_bundle(pipe, str(tmp_path / "pcm"), text_buckets=[64],
                  mel_buckets=[128], batches=(1,), n_timesteps=2, pcm16=True)
    meta = json.loads((tmp_path / "pcm" / "manifest.json").read_text())
    assert meta["pcm16"] is True

    f32, _ = LoadedBundle(str(tmp_path / "f32")).synthesise(
        ["hello there"], spks=[1], seed=5)
    pcm, _ = LoadedBundle(str(tmp_path / "pcm")).synthesise(
        ["hello there"], spks=[1], seed=5)
    assert pcm[0]["wav"].dtype == np.int16
    ref = (np.clip(f32[0]["wav"], -1.0, 1.0) * 32767.0).astype(np.int16)
    assert np.abs(pcm[0]["wav"].astype(np.int32) - ref.astype(np.int32)).max() <= 1

    # the runner CLI writes the int16 samples as a PCM wav verbatim
    from emojivoice_tpu.inference.export import main_run

    assert main_run(["--bundle", str(tmp_path / "pcm"), "--text", "hello there",
                     "--spk", "1", "--seed", "5",
                     "--output_folder", str(tmp_path / "out")]) == 0
    from scipy.io import wavfile

    sr, data = wavfile.read(tmp_path / "out" / "utterance_001.wav")
    assert sr == 22050 and data.dtype == np.int16 and data.size > 0


def test_bundle_skips_duration_program_when_bucket_known(pipe, tmp_path):
    """The synth programs compute durations in-graph; the dur program only
    CHOOSES a mel bucket.  Single-mel-bucket bundles and callers pinning
    ``mel_bucket=`` skip that dispatch (one call, one round trip); a pinned
    bucket that saturates escalates to the accurate dur-based pick instead
    of silently truncating audio."""
    import pytest

    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    export_bundle(pipe, str(tmp_path / "b1"), text_buckets=[64],
                  mel_buckets=[128], batches=(1,), n_timesteps=2)
    bundle = LoadedBundle(str(tmp_path / "b1"))
    loads = []
    orig = bundle._load
    bundle._load = lambda name: (loads.append(name), orig(name))[1]
    results, timings = bundle.synthesise(["hello there"], spks=[1], seed=5)
    assert not [n for n in loads if n.startswith("dur_")]  # skipped
    assert timings["mel_bucket"] == 128 and results[0]["mel_length"] > 0

    # two mel buckets: default path consults the dur program...
    export_bundle(pipe, str(tmp_path / "b2"), text_buckets=[64],
                  mel_buckets=[64, 128], batches=(1,), n_timesteps=2)
    bundle2 = LoadedBundle(str(tmp_path / "b2"))
    loads2 = []
    orig2 = bundle2._load
    bundle2._load = lambda name: (loads2.append(name), orig2(name))[1]
    res_dur, t_dur = bundle2.synthesise(["hello there"], spks=[1], seed=5)
    assert [n for n in loads2 if n.startswith("dur_")]

    # ...pinning the same bucket skips it and reproduces the result
    loads2.clear()
    res_pin, t_pin = bundle2.synthesise(["hello there"], spks=[1], seed=5,
                                        mel_bucket=t_dur["mel_bucket"])
    assert not [n for n in loads2 if n.startswith("dur_")]
    assert t_pin["mel_bucket"] == t_dur["mel_bucket"]
    np.testing.assert_array_equal(res_pin[0]["wav"], res_dur[0]["wav"])

    # a pinned bucket the utterance saturates escalates to the dur-based
    # pick instead of returning silently truncated audio
    if t_dur["mel_bucket"] == 128:  # durations genuinely overflow 64
        res_esc, t_esc = bundle2.synthesise(["hello there"], spks=[1], seed=5,
                                            mel_bucket=64)
        assert t_esc["mel_bucket"] == 128
        np.testing.assert_array_equal(res_esc[0]["wav"], res_dur[0]["wav"])

    # a bucket outside the exported grid is an explicit error
    with pytest.raises(ValueError, match="not in exported grid"):
        bundle2.synthesise(["hello"], spks=[1], mel_bucket=999)


@pytest.fixture(scope="module")
def served_bundle(pipe, tmp_path_factory):
    from emojivoice_tpu.inference.export import export_bundle

    d = tmp_path_factory.mktemp("served") / "bundle"
    export_bundle(pipe, str(d), text_buckets=[64], mel_buckets=[128],
                  batches=(1, 2), n_timesteps=2, pcm16=True)
    return str(d)


def test_bundle_backed_serving_engine(served_bundle):
    """BatchingEngine runs on an exported bundle (BundleSynthesisPipeline):
    concurrent requests coalesce into one padded-batch program dispatch, and
    a request inside a merged batch reproduces the direct bundle call with
    the same seed — versioned AOT serving without live model code."""
    import pytest

    from concurrent.futures import ThreadPoolExecutor

    from emojivoice_tpu.inference.export import BundleSynthesisPipeline
    from emojivoice_tpu.inference.serving import BatchingEngine

    bp = BundleSynthesisPipeline(served_bundle)
    assert bp.batch_buckets == (1, 2) and bp.n_timesteps == 2

    with BatchingEngine(bp, max_batch=2, max_wait_ms=2000,
                        batch_buckets=bp.batch_buckets) as eng:
        with ThreadPoolExecutor(2) as ex:
            futs = [ex.submit(lambda s: eng.submit(
                        f"request {s}", spk=s, n_timesteps=2, seed=100 + s).result(), i)
                    for i in range(2)]
            merged = [f.result(timeout=600) for f in futs]
        s = eng.stats()
        assert s["requests"] == 2 and s["batches"] <= 2
        for r in merged:
            assert r.wav.dtype == np.float32 and len(r.wav) > 0
            assert r.cleaned_text  # threaded through from the text frontend

        # per-request seed: the merged row == a direct call with that seed.
        # pcm16 bundles quantize on device, so XLA's per-shape reassociation
        # (~1e-6) can cross an int16 rounding boundary: tolerance = 1 LSB.
        direct = bp.synthesise(["request 1"], spks=[1], n_timesteps=2, seed=[101])[0]
        np.testing.assert_allclose(merged[1].wav, direct.wav, atol=1.01 / 32767.0)

        # the bundle's operating point is fixed: other step counts reject
        with pytest.raises(ValueError, match="n_timesteps"):
            eng.submit("x", n_timesteps=7).result(timeout=600)

    # warmup compiles every program of a batch bucket off the request path
    bp.warmup(n_timesteps=2, batch=1)
    with pytest.raises(ValueError, match="not in exported grid"):
        bp.warmup(n_timesteps=2, batch=64)


def test_webapp_serves_exported_bundle(served_bundle):
    """The web app serves an AOT bundle end to end (--bundle flag): HTML
    form path (no mel in vocoder bundles → audio-only page) and JSON API,
    with batching on the exported batch grid."""
    import json
    import threading
    import urllib.request

    from emojivoice_tpu.apps.webapp import serve
    from emojivoice_tpu.inference.export import BundleSynthesisPipeline

    bp = BundleSynthesisPipeline(served_bundle)
    server = serve(bp, port=0, batching=True, max_batch=8, max_wait_ms=5)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        # engine honors the exported batch grid, not the requested max
        assert server.engine.batch_buckets == (1, 2)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesise",
            data=json.dumps({"text": "bundle serving", "steps": 2, "spk": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["num_samples"] > 0 and out["cleaned_text"]

        # HTML form path: steps default comes from the bundle (2, not 10)
        form = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesise",
            data=b"text=hello+bundle&steps=2&temperature=0.667&length_scale=1.0&spk=1",
        )
        with urllib.request.urlopen(form, timeout=600) as r:
            page = r.read().decode()
        assert "audio controls" in page and "<img" not in page  # no mel image
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=60) as r:
            assert 'name="steps" type="number" value="2"' in r.read().decode()
    finally:
        server.shutdown()
        server.engine.close()


def test_bundle_serving_defaults_and_rejections(pipe, tmp_path):
    """Review regressions: (a) engine.submit with NO explicit operating
    point adopts the bundle's exported steps/denoiser (a bundle exported at
    a non-default denoiser_strength used to fail 100% of batched requests);
    (b) a mel-only (--no_vocoder) bundle is rejected at construction rather
    than silently serving zero-length audio; (c) an unknown --language is
    rejected at construction."""
    import pytest

    from emojivoice_tpu.inference.export import BundleSynthesisPipeline, export_bundle
    from emojivoice_tpu.inference.serving import BatchingEngine

    export_bundle(pipe, str(tmp_path / "od"), text_buckets=[64], mel_buckets=[128],
                  batches=(1,), n_timesteps=2, denoiser_strength=0.001, pcm16=True)
    bp = BundleSynthesisPipeline(str(tmp_path / "od"))
    assert bp.denoiser_strength == 0.001
    with BatchingEngine(bp, max_batch=1, max_wait_ms=1,
                        batch_buckets=bp.batch_buckets) as eng:
        res = eng.submit("operating point", spk=1).result(timeout=600)
        assert len(res.wav) > 0
        # explicit mismatches still reject
        with pytest.raises(ValueError, match="denoiser_strength"):
            eng.submit("x", denoiser_strength=0.5).result(timeout=600)

    mel_pipe = SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64,),
        text_buckets=(64,), with_vocoder=False)
    export_bundle(mel_pipe, str(tmp_path / "melonly"), text_buckets=[64],
                  mel_buckets=[64], batches=(1,), n_timesteps=2)
    with pytest.raises(ValueError, match="no_vocoder"):
        BundleSynthesisPipeline(str(tmp_path / "melonly"))

    with pytest.raises(KeyError, match="Unknown language"):
        BundleSynthesisPipeline(str(tmp_path / "od"), language="xx")


def test_webapp_errors_are_http_statuses(served_bundle):
    """A request asking a bundle-backed webapp for an unsupported step count
    gets an HTTP 400, not a connection reset from a dead handler thread."""
    import threading
    import urllib.error
    import urllib.request

    from emojivoice_tpu.apps.webapp import serve
    from emojivoice_tpu.inference.export import BundleSynthesisPipeline

    bp = BundleSynthesisPipeline(served_bundle)
    server = serve(bp, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesise",
            data=json.dumps({"text": "wrong steps", "steps": 7, "spk": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=600)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "n_timesteps" in e.read().decode()
        # streaming needs the live pipeline's mel-only stage: bundles → 400
        sreq = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/stream",
            data=json.dumps({"text": "no streaming from bundles"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(sreq, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400 and "live pipeline" in e.read().decode()
    finally:
        server.shutdown()


def test_multi_platform_bundle_runs_on_cpu(pipe, tmp_path):
    """A bundle exported with platforms=["cpu", "tpu"] embeds lowerings for
    both targets (jax.export multi-platform): export once on any host, serve
    the same artifact on a TPU pod or a CPU fallback box.  Here we verify
    the manifest records both platforms and the bundle executes on the CPU
    backend the tests run under."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    export_bundle(pipe, str(tmp_path / "mp"), text_buckets=[64],
                  mel_buckets=[128], batches=(1,), n_timesteps=2,
                  platforms=["cpu", "tpu"])
    bundle = LoadedBundle(str(tmp_path / "mp"))
    meta = json.loads((tmp_path / "mp" / "synth_b1_t64_m128.json").read_text())
    assert set(meta["platforms"]) == {"cpu", "tpu"}
    results, _ = bundle.synthesise(["hello there"], spks=[1], seed=5)
    assert results[0]["mel_length"] > 0 and np.isfinite(results[0]["wav"]).all()


def test_export_without_vocoder_emits_mel_programs(tmp_path):
    """A pipeline with no vocoder must export mel programs (and an honest
    manifest) rather than crash on vocoder_cfg=None — review regression."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle

    mel_pipe = SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64,), text_buckets=(64,),
        with_vocoder=False,
    )
    manifest = export_bundle(mel_pipe, str(tmp_path / "melbundle"),
                             text_buckets=[64], mel_buckets=[64], batches=(1,), n_timesteps=2)
    meta = json.loads(manifest.read_text())
    assert meta["with_vocoder"] is False and meta["upsample"] is None
    bundle = LoadedBundle(str(tmp_path / "melbundle"))
    results, _ = bundle.synthesise(["mel only"], spks=[0])
    assert "mel" in results[0] and results[0]["mel"].shape[-1] == tiny_root().model.n_feats


def test_run_exported_cli(pipe, tmp_path, monkeypatch):
    """emojivoice-export / emojivoice-run-exported CLI round trip: export a
    bundle from random init, run it on a file of texts, wavs land on disk
    with an RTF report (reference analog: onnx/infer.py:24-83)."""
    from emojivoice_tpu.inference.export import export_bundle, main_run

    export_bundle(pipe, str(tmp_path / "bundle"), text_buckets=[64], mel_buckets=[64, 128],
                  batches=(1, 2), n_timesteps=2)
    f = tmp_path / "texts.txt"
    f.write_text("hello world|1\nanother line|2\n")
    out_dir = tmp_path / "wavs"
    rc = main_run(["--bundle", str(tmp_path / "bundle"), "--file", str(f),
                   "--output_folder", str(out_dir)])
    assert rc == 0
    wavs = sorted(out_dir.glob("*.wav"))
    assert len(wavs) == 2
    from scipy.io import wavfile

    sr, data = wavfile.read(wavs[0])
    assert sr == 22050 and data.size > 0


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


def test_logger_backends(tmp_path, capsys):
    """CSV/wandb/multi logger backends (reference: configs/logger/*.yaml)."""
    import csv

    from emojivoice_tpu.utils.observability import (
        CSVLogger,
        MultiLogger,
        WandbLogger,
        make_logger,
    )

    # CSV: wide format, late-appearing tags get columns, step-sorted rows
    c = CSVLogger(str(tmp_path / "csv"))
    c.scalar("train/loss", 2.0, step=1)
    c.scalar("train/loss", 1.5, step=2)
    c.scalar("val/loss", 3.0, step=2)  # appears after the header would have
    c.image("mel", np.zeros((4, 4)), step=2)  # scalars-only: no-op, no crash
    c.close()
    rows = list(csv.DictReader(open(tmp_path / "csv" / "metrics.csv")))
    assert [r["step"] for r in rows] == ["1", "2"]
    assert rows[0]["train/loss"] == "2.0" and rows[0]["val/loss"] == ""
    assert rows[1]["val/loss"] == "3.0"

    # wandb is absent in this image: gated, factory warns and skips
    assert not WandbLogger.available()
    w = make_logger("tensorboard,csv,wandb", str(tmp_path / "multi"))
    assert isinstance(w, MultiLogger) and len(w.writers) == 2
    assert "wandb" in capsys.readouterr().err
    w.scalar("loss", 1.0, step=1)
    w.close()
    assert (tmp_path / "multi" / "scalars.jsonl").exists()
    assert (tmp_path / "multi" / "metrics.csv").exists()

    # unknown backend is loud; empty resolution falls back to tensorboard
    with pytest.raises(ValueError):
        make_logger("mlflow", str(tmp_path / "x"))
    from emojivoice_tpu.utils.observability import TensorBoardWriter

    assert isinstance(make_logger("wandb", str(tmp_path / "fb")), TensorBoardWriter)


def test_run_exported_speaking_rate_matches_live(pipe, tmp_path):
    """--speaking_rate passes straight through as length_scale (reference
    cli.py:297, onnx/infer.py:145) — an inversion would make the exported
    runner slow down where the live CLI speeds up."""
    from emojivoice_tpu.inference.export import LoadedBundle, export_bundle, main_run

    export_bundle(pipe, str(tmp_path / "b"), text_buckets=[64], mel_buckets=[64, 128],
                  batches=(1,), n_timesteps=2)
    out_dir = tmp_path / "wavs"
    rc = main_run(["--bundle", str(tmp_path / "b"), "--text", "rate check here",
                   "--spk", "1", "--speaking_rate", "0.7", "--seed", "5",
                   "--output_folder", str(out_dir)])
    assert rc == 0
    bundle = LoadedBundle(str(tmp_path / "b"))
    direct, _ = bundle.synthesise(["rate check here"], spks=[1], length_scale=0.7, seed=5)
    from scipy.io import wavfile

    sr, wav = wavfile.read(sorted(out_dir.glob("*.wav"))[0])
    want = direct[0]["wav"]
    assert wav.dtype == np.float32 and wav.size == want.size
    np.testing.assert_allclose(wav, np.clip(want, -1.0, 1.0), atol=1e-6)
