"""JAX-native ASR/LLM adapters (apps/flax_adapters.py), hermetically.

No weights are downloadable in this image, so the adapters are driven with
tiny random-init transformer configs and stub tokenizers — exercising the
real compiled paths (Flax Whisper greedy decode, causal-LM bucketed
generate) without network.  Reference chain being replaced: torch whisper
(/root/reference/feel_me.py:29,268) + Ollama HTTP (feel_me.py:115-119).
"""

import numpy as np
import pytest

from emojivoice_tpu.apps.flax_adapters import FlaxChatLM, FlaxWhisperASR

transformers = pytest.importorskip("transformers")


class StubTokenizer:
    """Minimal decode/encode surface: id <-> 'w<id>' words."""

    pad_token_id = 0
    eos_token_id = 2
    chat_template = None

    def __call__(self, text):
        # deterministic across processes (unlike builtin hash under
        # PYTHONHASHSEED randomization)
        ids = [3 + (sum(ord(c) for c in tok) % 60) for tok in text.split()]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        if skip_special_tokens:
            ids = [i for i in ids if i > 2]
        return " ".join(f"w{i}" for i in ids)


@pytest.fixture(scope="module")
def tiny_whisper():
    from transformers import FlaxWhisperForConditionalGeneration, WhisperConfig

    cfg = WhisperConfig(
        vocab_size=64, num_mel_bins=80, d_model=32,
        encoder_layers=1, decoder_layers=1,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=48,
        decoder_start_token_id=1, eos_token_id=2, pad_token_id=0, bos_token_id=1,
        begin_suppress_tokens=None, suppress_tokens=None, forced_decoder_ids=None,
    )
    return FlaxWhisperForConditionalGeneration(cfg, seed=0)


@pytest.fixture(scope="module")
def tiny_gpt2():
    from transformers import FlaxGPT2LMHeadModel, GPT2Config

    cfg = GPT2Config(
        vocab_size=96, n_positions=256, n_embd=32, n_layer=2, n_head=2,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    return FlaxGPT2LMHeadModel(cfg, seed=0)


def test_flax_whisper_transcribe_deterministic(tiny_whisper, tmp_path):
    asr = FlaxWhisperASR(model=tiny_whisper, tokenizer=StubTokenizer(), max_length=12)
    t = np.linspace(0, 1.0, 22050, endpoint=False)
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)

    a = asr.transcribe_array(wav, 22050)  # exercises the 22.05k→16k resample
    b = asr.transcribe_array(wav, 22050)
    assert isinstance(a, str)
    assert a == b  # greedy decode under jit is deterministic

    from scipy.io import wavfile

    path = tmp_path / "utt.wav"
    wavfile.write(path, 22050, (wav * 32767).astype(np.int16))
    c = asr.transcribe(str(path))
    assert isinstance(c, str)


def test_flax_whisper_single_program(tiny_whisper):
    """Any input length maps to the fixed (1, 80, 3000) feature shape —
    one compiled program serves all utterances."""
    asr = FlaxWhisperASR(model=tiny_whisper, tokenizer=StubTokenizer(), max_length=12)
    shapes = set()
    orig = asr._generate

    def spy(feats, p):
        shapes.add(feats.shape)
        return orig(feats, p)

    asr._generate = spy
    for n in (8000, 16000, 60000):
        asr.transcribe_array(np.zeros(n, np.float32), 16000)
    assert shapes == {(1, 80, 3000)}


def test_flax_chat_lm_greedy_and_buckets(tiny_gpt2):
    llm = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.0,
                     max_new_tokens=8, prompt_buckets=(16, 32, 64))
    r1 = llm.chat("be brief", [], "hello there")
    llm2 = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.0,
                      max_new_tokens=8, prompt_buckets=(16, 32, 64))
    r2 = llm2.chat("be brief", [], "hello there")
    assert r1 == r2  # greedy: reproducible across instances

    # short and long prompts land in different buckets; both run
    hist = [{"role": "user", "content": "x " * 20}, {"role": "assistant", "content": "y " * 20}]
    r3 = llm.chat("be brief", hist, "hello again")
    assert isinstance(r3, str)
    assert {k[0] for k in llm._programs} >= {16}
    assert len(llm._programs) == 2  # two buckets compiled, not one per call


def test_flax_chat_lm_sampling_reproducible(tiny_gpt2):
    a = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.8,
                   max_new_tokens=8, seed=7, prompt_buckets=(16, 32))
    b = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.8,
                   max_new_tokens=8, seed=7, prompt_buckets=(16, 32))
    c = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.8,
                   max_new_tokens=8, seed=8, prompt_buckets=(16, 32))
    msgs = ["hello", "tell me more"]
    seq_a = [a.chat("sys", [], m) for m in msgs]
    seq_b = [b.chat("sys", [], m) for m in msgs]
    seq_c = [c.chat("sys", [], m) for m in msgs]
    assert seq_a == seq_b  # same seed → same turn-keyed sampling stream
    assert seq_a != seq_c  # different seed → different stream (overwhelmingly)


def test_flax_chat_lm_truncates_overlong_prompt(tiny_gpt2):
    llm = FlaxChatLM(model=tiny_gpt2, tokenizer=StubTokenizer(), temperature=0.0,
                     max_new_tokens=4, prompt_buckets=(16,))
    r = llm.chat("sys", [], "word " * 100)  # >16 tokens → keep the tail
    assert isinstance(r, str)
    assert all(k[0] == 16 for k in llm._programs)


def test_feel_me_turn_with_flax_llm(tiny_gpt2):
    """The full agent turn drives a JAX-native LLM end to end: the reply is
    parsed for an emoji voice and synthesized through the pipeline."""
    from emojivoice_tpu.apps import adapters as ad
    from emojivoice_tpu.apps.feel_me import FeelMe

    class EmojiStubTokenizer(StubTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            return "what a day 🙂"

    llm = FlaxChatLM(model=tiny_gpt2, tokenizer=EmojiStubTokenizer(), temperature=0.0,
                     max_new_tokens=4, prompt_buckets=(16, 32, 64, 128, 256))

    class SpySink:
        def __init__(self):
            self.played = []

        def play(self, wav, sample_rate):
            self.played.append((np.asarray(wav).shape, sample_rate))

    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from tests.test_pipeline import tiny_root

    pipe = SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256),
        text_buckets=(64, 128),
    )
    sink = SpySink()
    app = FeelMe(pipe, asr=ad.ConsoleASR(), llm=llm, sink=sink, steps=2, language=None)
    response, spk, spoken = app.turn("hi robot")
    assert response.endswith("🙂")
    assert spoken == "what a day"
    assert spk == 12  # 🙂 → speaker 12 (reference feel_me.py mapping)
    assert len(sink.played) == 1


def test_fit_messages_preserves_system_prompt(tiny_gpt2):
    """Overlong conversations drop the OLDEST history, never the system
    message — tail-truncation would cut the emoji instructions exactly when
    the chat gets long."""

    class WordTokenizer(StubTokenizer):
        def __call__(self, text):
            return {"input_ids": [3 + (sum(ord(c) for c in t) % 89) for t in text.split()]}

    tok = WordTokenizer()
    llm = FlaxChatLM(model=tiny_gpt2, tokenizer=tok, temperature=0.0,
                     max_new_tokens=4, prompt_buckets=(32,))
    system = "always end with emoji"
    hist = []
    for i in range(12):
        hist.append({"role": "user", "content": f"u{i} filler words here"})
        hist.append({"role": "assistant", "content": f"a{i} more filler words"})
    from emojivoice_tpu.apps.adapters import build_messages

    msgs = build_messages(system, hist, "latest question")
    ids = llm._fit_messages(msgs)
    assert len(ids) <= 32
    sys_ids = tok("system: " + system)["input_ids"]
    assert ids[: len(sys_ids)] == sys_ids  # system head intact
    tail_ids = tok("latest question")["input_ids"]
    assert ids[-len(tail_ids) - 1:][: len(tail_ids)] or True  # tail retained below
    joined = ids[-8:]
    assert all(t in joined for t in tail_ids)  # current turn survives


def test_chat_template_tokenizes_once(tiny_gpt2):
    """Templated tokenizers produce ids via apply_chat_template directly —
    re-tokenizing the rendered string would duplicate special tokens."""

    class TemplatedTokenizer(StubTokenizer):
        chat_template = "{{messages}}"

        def apply_chat_template(self, messages, tokenize, add_generation_prompt):
            assert tokenize and add_generation_prompt
            return [7] * (3 * len(messages))

        def __call__(self, text):  # noqa: ARG002
            raise AssertionError("rendered template must not be re-tokenized")

    llm = FlaxChatLM(model=tiny_gpt2, tokenizer=TemplatedTokenizer(), temperature=0.0,
                     max_new_tokens=4, prompt_buckets=(16, 32))
    reply = llm.chat("sys", [], "hi")
    assert isinstance(reply, str)


def test_feel_me_run_records_before_transcribing(tmp_path):
    """The loop records push-to-talk audio into record_path and hands that
    file to a needs_audio ASR (reference feel_me.py:280-283 semantics)."""
    import builtins

    from emojivoice_tpu.apps import adapters as ad
    from emojivoice_tpu.apps.feel_me import FeelMe
    from emojivoice_tpu.inference.pipeline import SynthesisPipeline
    from tests.test_pipeline import tiny_root

    wav_path = str(tmp_path / "output.wav")

    class FakeRecorder:
        def __init__(self):
            self.calls = 0

        def record(self, path):
            self.calls += 1
            from scipy.io import wavfile

            wavfile.write(path, 22050, np.zeros(2205, np.int16))
            return True

    class FileASR:
        needs_audio = True

        def __init__(self):
            self.paths = []

        def transcribe(self, path):
            assert os.path.exists(path)
            self.paths.append(path)
            return "hello robot" if len(self.paths) == 1 else "end session"

    import os

    pipe = SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256),
        text_buckets=(64, 128),
    )
    rec, asr = FakeRecorder(), FileASR()
    app = FeelMe(pipe, asr=asr, llm=ad.ScriptedLLM(["okay then 🙂"]),
                 sink=ad.FileSink(str(tmp_path)), recorder=rec,
                 record_path=wav_path, steps=2, language=None)
    # run() blocks on input() before each recording; feed two Enters
    orig_input = builtins.input
    builtins.input = lambda *a: ""
    try:
        app.run()
    finally:
        builtins.input = orig_input
    assert rec.calls == 2
    assert asr.paths == [wav_path, wav_path]


def test_feel_me_needs_audio_without_recorder_raises(monkeypatch):
    from emojivoice_tpu.apps import adapters as ad
    from emojivoice_tpu.apps.feel_me import FeelMe

    class FileASR:
        needs_audio = True

        def transcribe(self, path):  # noqa: ARG002
            return ""

    monkeypatch.setattr(ad, "default_recorder", lambda: None)
    with pytest.raises(RuntimeError, match="recorder"):
        FeelMe(pipeline=None, asr=FileASR(), llm=ad.ScriptedLLM(), sink=ad.FileSink("."))
