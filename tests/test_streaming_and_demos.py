"""Streaming vocoder, case-study demos, Pepper adapter, webapp."""

import json
import threading
import urllib.request
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emojivoice_tpu.inference.pipeline import SynthesisPipeline
from emojivoice_tpu.inference.streaming import StreamingVocoder, stream_synthesise

from tests.test_pipeline import tiny_root


@pytest.fixture(scope="module")
def pipe():
    return SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256), text_buckets=(64, 128)
    )


def test_streaming_matches_monolithic(pipe):
    """Chunked vocoding is bit-exact vs the monolithic call when the overlap
    covers the receptive field (boundary windows share the conv zero-pad)."""
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(128, 12)).astype(np.float32) * 2 - 6  # bucket-sized
    ml = 100
    sv = StreamingVocoder(pipe.vocoder, pipe.vocoder_params, chunk_frames=32, overlap=8)
    chunks = list(sv.stream(mel, mel_length=ml))
    streamed = np.concatenate(chunks)
    mono = np.asarray(pipe.vocoder.apply(pipe.vocoder_params, jnp.asarray(mel[None])))[0]
    assert streamed.shape[0] == ml * sv.ups
    np.testing.assert_allclose(streamed, mono[: len(streamed)], atol=1e-6)


def test_streaming_insufficient_overlap_detected(pipe):
    """With overlap below the receptive field the interior drifts — guard
    that the test above is actually discriminative."""
    rng = np.random.default_rng(1)
    mel = rng.normal(size=(128, 12)).astype(np.float32) * 2 - 6
    sv = StreamingVocoder(pipe.vocoder, pipe.vocoder_params, chunk_frames=32, overlap=0)
    streamed = np.concatenate(list(sv.stream(mel, mel_length=128)))
    mono = np.asarray(pipe.vocoder.apply(pipe.vocoder_params, jnp.asarray(mel[None])))[0]
    assert np.abs(streamed - mono).max() > 1e-3


def test_stream_synthesise_generator(pipe):
    chunks = list(stream_synthesise(pipe, "streaming hello world", spk=1, n_timesteps=2,
                                    seed=0, chunk_frames=16, overlap=8))
    assert len(chunks) >= 1
    total = sum(len(c) for c in chunks)
    assert total > 0 and total % 16 == 0  # ups=16 for tiny vocoder


def test_demo_render_and_story(pipe, tmp_path):
    from emojivoice_tpu.apps.demos import render_script, run_story

    script = tmp_path / "script.txt"
    script.write_text('Byte: 😎 "No worries. I will handle it."\nAlex: plain line\n')
    out = tmp_path / "out"
    render_script(pipe, str(script), str(out), steps=2)
    assert (out / "1.wav").exists() and (out / "2.wav").exists()

    story = tmp_path / "story.txt"
    story.write_text("Once upon a time 😎.\nA second line 😭!\n")
    out2 = tmp_path / "story_out"
    out2.mkdir()
    run_story(pipe, str(story), str(out2), play=False, steps=2)
    assert (out2 / "to_play-0.wav").exists() and (out2 / "to_play-1.wav").exists()


def test_demo_game_loop(pipe, tmp_path):
    from emojivoice_tpu.apps.adapters import FileSink, ScriptedLLM
    from emojivoice_tpu.apps.demos import run_game

    class FakeASR:
        def __init__(self):
            self.lines = iter(["the knight entered the cave", "end session"])

        def transcribe(self, _):
            return next(self.lines)

    n = run_game(pipe, voice="male", steps=2, llm=ScriptedLLM(), asr=FakeASR(),
                 sink=FileSink(str(tmp_path)))
    assert n == 1
    assert len(list(Path(tmp_path).glob("*.wav"))) == 1


def test_pepper_local_roundtrip(tmp_path):
    from scipy.io import wavfile

    from emojivoice_tpu.apps.adapters import FileSink
    from emojivoice_tpu.apps.pepper import (
        LocalTransport,
        format_audio_16bit,
        run_storytelling,
        wait_for_file_update,
    )

    # 16-bit conversion
    src = tmp_path / "a.wav"
    wavfile.write(src, 22050, (np.sin(np.linspace(0, 50, 1000)) * 0.5).astype(np.float32))
    out16 = format_audio_16bit(str(src))
    sr, data = wavfile.read(out16)
    assert data.dtype == np.int16 and sr == 22050

    # storytelling relay over the local transport
    script = tmp_path / "s.txt"
    script.write_text("line one\nline two\n")
    for i in range(2):
        wavfile.write(tmp_path / f"to_play-{i}.wav", 22050,
                      (np.zeros(500)).astype(np.float32))
    transport = LocalTransport(str(tmp_path / "played"))
    transport.sink = FileSink(str(tmp_path / "played"))
    n = run_storytelling(transport, str(tmp_path), str(script), timeout=5)
    assert n == 2 and len(transport.played) == 2

    with pytest.raises(TimeoutError):
        wait_for_file_update(str(tmp_path / "never.wav"), timeout=0.3)


def test_webapp_http(pipe):
    from emojivoice_tpu.apps.webapp import serve

    server = serve(pipe, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert b"emojivoice-tpu" in r.read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesise",
            data=json.dumps({"text": "hello web", "steps": 2, "spk": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["num_samples"] > 0 and out["sample_rate"] == 22050
        # bad request
        req = urllib.request.Request(f"http://127.0.0.1:{port}/api/synthesise",
                                     data=json.dumps({"text": ""}).encode(),
                                     headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req)
    finally:
        server.shutdown()


def test_webapp_multi_model_compare(pipe):
    """Multi-checkpoint serving (the reference demo's two-model layout +
    cached examples, app.py:101-353): /api/models lists them, the form gets
    a model select, per-request model choice works, and compare=1 returns
    one result per model for the same text/seed."""
    import urllib.error

    from emojivoice_tpu.apps.webapp import serve

    other = SynthesisPipeline.from_random(
        tiny_root(), seed=5, cleaners=("basic_cleaners",),
        mel_buckets=(64, 128, 256), text_buckets=(64, 128))
    server = serve(pipe, port=0, extra_models={"alt": other},
                   cache_example_texts=("tiny example",),
                   defaults={"text": "hi", "steps": 2, "temperature": 0.667,
                             "length_scale": 1.0, "spk": 1})
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/api/models") as r:
            out = json.loads(r.read())
        assert out == {"models": ["default", "alt"], "primary": "default"}
        # index page: model select present, cached example pre-rendered
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            page = r.read().decode()
        assert '<select name="model">' in page and "Cached examples" in page
        assert page.count("audio controls") >= 2  # one example per model

        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/synthesise",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as r:
                return json.loads(r.read())

        one = post({"text": "hello compare", "steps": 2, "spk": 1, "model": "alt"})
        assert one["model"] == "alt" and one["num_samples"] > 0
        both = post({"text": "hello compare", "steps": 2, "spk": 1, "compare": 1})
        assert [b["model"] for b in both["compare"]] == ["default", "alt"]
        assert all(b["num_samples"] > 0 for b in both["compare"])
        # unknown model name is the request's fault
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/synthesise",
            data=json.dumps({"text": "x", "model": "nope"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_webapp_stream_endpoint(pipe):
    """POST /api/stream answers a progressive WAV whose pcm16 samples equal
    the chosen strategy's chunks for the same seed (the header is the
    until-EOF convention: sizes 0xFFFFFFFF); `strategy=` forces a path and
    the default auto-select serves short text one fused dispatch."""
    import struct
    import urllib.error

    from emojivoice_tpu.apps.webapp import serve
    from emojivoice_tpu.inference.streaming import stream_synthesise

    server = serve(pipe, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post_stream(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/stream",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF
        assert struct.unpack("<I", body[24:28])[0] == 22050
        return np.frombuffer(body[44:], dtype="<i2").astype(np.float32) / 32767.0

    try:
        # forced chunked-vocoder path: bit-equal to stream_synthesise
        got = post_stream({"text": "stream me", "steps": 2, "spk": 1,
                           "seed": 11, "strategy": "stream"})
        ref = np.concatenate(list(stream_synthesise(
            pipe, "stream me", spk=1, n_timesteps=2, seed=11)))
        ref = np.clip(ref, -1.0, 1.0)
        assert len(got) == len(ref)
        np.testing.assert_allclose(got, ref, atol=1.01 / 32767.0)

        # default auto-select: short single-sentence text rides ONE fused
        # dispatch (the full strategy — ttfa.json shows stream loses there)
        got_auto = post_stream({"text": "stream me", "steps": 2, "spk": 1,
                                "seed": 11})
        ref_full = pipe.synthesise(["stream me"], spks=[1], n_timesteps=2,
                                   seed=11)[0].wav
        ref_full = np.clip(ref_full, -1.0, 1.0)
        assert len(got_auto) == len(ref_full)
        np.testing.assert_allclose(got_auto, ref_full, atol=1.01 / 32767.0)

        # unknown strategy and empty text are 400s, not dead handlers
        for payload in (b"text=", b"text=hi&strategy=bogus"):
            bad = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/stream", data=payload,
            )
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(bad, timeout=60)
    finally:
        server.shutdown()


def test_choose_strategy_and_auto_stream(pipe):
    from emojivoice_tpu.inference.streaming import auto_stream, choose_strategy

    # short single sentence → one fused dispatch
    assert choose_strategy("That sounds like a wonderful plan!")[0] == "full"
    # multi-sentence → pipelined dispatch-ahead
    strat, segs = choose_strategy(
        "First sentence here. And then a second one follows. And a third!",
        segment_chars=30)
    assert strat == "pipelined" and len(segs) > 1
    # one long unbreakable run → chunked vocoder
    strat, _ = choose_strategy("word " * 40, segment_chars=400)
    assert strat == "stream"
    # a slower speaking rate lengthens predicted audio → stream sooner
    text = "word " * 20  # ~7.1 s predicted at rate 1.0 — under the threshold
    assert choose_strategy(text, 400, length_scale=1.0)[0] == "full"
    assert choose_strategy(text, 400, length_scale=2.0)[0] == "stream"

    # auto full-path audio == the plain synthesise call
    wav = np.concatenate(list(auto_stream(pipe, "hello there", spk=1,
                                          n_timesteps=2, seed=3)))
    ref = pipe.synthesise(["hello there"], spks=[1], n_timesteps=2, seed=3)[0].wav
    np.testing.assert_allclose(wav, ref, atol=0)

    # forcing the losing strategy still works (debug/bench hook)
    wav_s = np.concatenate(list(auto_stream(pipe, "hello there", spk=1,
                                            n_timesteps=2, seed=3,
                                            strategy="stream")))
    assert wav_s.size > 0


def test_webapp_error_statuses(pipe):
    """Request faults answer real HTTP statuses on every endpoint: malformed
    JSON bodies are a 400 (not a traceback/connection reset), and a stream
    request with an unknown language 400s BEFORE the response starts —
    stream_synthesise is lazy, so without the pre-flight the client would
    get a 'successful' empty WAV."""
    import urllib.error

    from emojivoice_tpu.apps.webapp import serve

    server = serve(pipe, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        def post(path, data, ctype="application/json"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=data,
                headers={"Content-Type": ctype})
            return urllib.request.urlopen(req, timeout=120)

        for path in ("/api/synthesise", "/api/stream"):
            with pytest.raises(urllib.error.HTTPError) as exc:
                post(path, b"{bad json")
            assert exc.value.code == 400

        with pytest.raises(urllib.error.HTTPError) as exc:
            post("/api/stream", json.dumps(
                {"text": "hi", "steps": 2, "language": "zz"}).encode())
        assert exc.value.code == 400
        assert "zz" in exc.value.read().decode()

        # a valid language override works on both endpoints
        with post("/api/synthesise", json.dumps(
                {"text": "hello", "steps": 2, "language": "en"}).encode()) as r:
            assert json.loads(r.read())["num_samples"] > 0
        with post("/api/stream", json.dumps(
                {"text": "hello", "steps": 2, "language": "en"}).encode()) as r:
            assert len(r.read()) > 44  # header + audio bytes
    finally:
        server.shutdown()


def test_record_audio_tools(tmp_path, rng):
    from scipy.io import wavfile

    from emojivoice_tpu.apps.record_audio import EMOTION_EMOJIS, make_filelist, resample_tree

    assert len(EMOTION_EMOJIS) == 11
    # build a fake recordings tree at 44.1k
    scripts = tmp_path / "scripts"
    scripts.mkdir()
    (scripts / "script-neutral.txt").write_text("first sentence\nsecond sentence\n")
    rec = tmp_path / "recordings" / "neutral"
    rec.mkdir(parents=True)
    for i in range(2):
        wavfile.write(rec / f"paige-neutral-{i}.wav", 44100,
                      (rng.normal(size=22050) * 3000).astype(np.int16))
    resample_tree(tmp_path / "recordings", 22050)
    sr, data = wavfile.read(rec / "paige-neutral-0.wav")
    assert sr == 22050

    rows = make_filelist(tmp_path / "recordings", scripts, {"neutral": 12},
                         tmp_path / "train.txt")
    assert len(rows) == 2
    assert rows[0].endswith("|12|first sentence")


def test_streaming_pallas_backend_matches_its_monolithic(pipe):
    """With the pipeline's fused-Pallas vocode_fn (interpret mode here), the
    exactness contract still holds against the SAME backend's monolithic
    call — on real TPUs streaming rides the pipeline's backend policy."""
    from emojivoice_tpu.ops.pallas_mrf import hifigan_apply_pallas

    rng = np.random.default_rng(2)
    mel = rng.normal(size=(128, 12)).astype(np.float32) * 2 - 6

    def pallas_vocode(params, window):
        return hifigan_apply_pallas(pipe.vocoder_cfg, params, window,
                                    t_tile=64, interpret=True, stages="all")

    sv = StreamingVocoder(pipe.vocoder, pipe.vocoder_params, chunk_frames=32,
                          overlap=8, vocode_fn=pallas_vocode)
    streamed = np.concatenate(list(sv.stream(mel, mel_length=100)))
    mono = np.asarray(pallas_vocode(pipe.vocoder_params, jnp.asarray(mel[None])))[0]
    np.testing.assert_allclose(streamed, mono[: len(streamed)], atol=1e-6)


def test_stream_synthesise_uses_pipeline_backend(pipe):
    """stream_synthesise wires the pipeline's _vocode into the cached
    StreamingVocoder (backend consistency on real TPUs)."""
    pipe._streaming_vocoder = None
    chunks = list(stream_synthesise(pipe, "backend check", spk=0, n_timesteps=2,
                                    seed=1, chunk_frames=16, overlap=8))
    assert sum(len(c) for c in chunks) > 0
    assert pipe._streaming_vocoder is not None
