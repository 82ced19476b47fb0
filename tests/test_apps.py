"""Application layer: emoji parsing, feel_me loop with hermetic adapters."""

import numpy as np
import pytest

from emojivoice_tpu.apps.adapters import FileSink, ScriptedLLM
from emojivoice_tpu.apps.emoji import (
    EMOJI_MAPPING,
    EMOJI_MAPPING_MALE,
    is_emoji,
    parse_emoji_response,
    segment_by_emoji,
    strip_emoji,
)
from emojivoice_tpu.apps.feel_me import FeelMe
from emojivoice_tpu.inference.pipeline import SynthesisPipeline

from tests.test_pipeline import tiny_root


def test_emoji_mapping_values():
    # reference feel_me.py:84-96 and case3 main.py:111-123
    assert EMOJI_MAPPING["😍"] == 107 and EMOJI_MAPPING["🤔"] == 17
    assert len(EMOJI_MAPPING) == 11
    assert EMOJI_MAPPING_MALE["😎"] == 6 and len(EMOJI_MAPPING_MALE) == 11


def test_is_emoji_and_strip():
    assert is_emoji("😎") and is_emoji("🤔")
    assert not is_emoji("a") and not is_emoji("!") and not is_emoji("é")
    assert strip_emoji("hi 😎 there 🤔!") == "hi  there !"


def test_parse_emoji_response():
    spk, text = parse_emoji_response("What a great day! 😎")
    assert spk == 79
    assert text == "What a great day!"
    # first mapped emoji wins
    spk, _ = parse_emoji_response("mixed 😭 then 😡 feelings")
    assert spk == 103
    # unmapped emoji → default speaker, still stripped
    spk, text = parse_emoji_response("strange 🦄 one", default_spk=5)
    assert spk == 5 and "🦄" not in text
    # brackets stripped (matcha cannot handle them, feel_me.py:310-312)
    _, text = parse_emoji_response("hello (world) 🙂")
    assert text == "hello world"


def test_segment_by_emoji():
    segs = segment_by_emoji("First part 😎 second part 😭 trailing")
    assert segs[0] == (79, "First part")
    assert segs[1] == (103, "second part")
    assert segs[2] == (0, "trailing")


@pytest.fixture(scope="module")
def tiny_pipe():
    return SynthesisPipeline.from_random(
        tiny_root(), cleaners=("basic_cleaners",), mel_buckets=(64, 128, 256), text_buckets=(64, 128)
    )


def test_feel_me_turn(tiny_pipe, tmp_path):
    sink = FileSink(str(tmp_path))
    llm = ScriptedLLM(["The robot smiled widely. 😁", "😭"])
    app = FeelMe(tiny_pipe, asr=None, llm=llm, sink=sink, steps=2, language=None)
    app.language = None  # use pipeline's default cleaners (basic)

    response, spk, spoken = app.turn("tell me a story")
    assert spk == 18  # 😁
    assert "😁" not in spoken
    assert sink.count == 1
    assert sink.last_path.exists()

    # emoji-only reply → speaks "nice" with that voice (feel_me.py:315-317)
    response, spk, spoken = app.turn("go on")
    assert spk == 103 and spoken == "nice"
    assert sink.count == 2
    assert len(app.history) == 4


def test_feel_me_pipelined_multisentence(tiny_pipe, tmp_path):
    """Multi-sentence replies speak segment-by-segment (dispatch-ahead,
    inference/longform.py): first audio is one short segment's synthesis,
    and each segment reaches the sink as its own play call.  The reference
    synthesizes the whole reply before any sound (feel_me.py:189-203)."""
    sink = FileSink(str(tmp_path))
    llm = ScriptedLLM(["One tiny tale. Then another tale follows after it. 😁"])
    app = FeelMe(tiny_pipe, asr=None, llm=llm, sink=sink, steps=2, language=None,
                 segment_chars=24)
    app.language = None
    _, spk, spoken = app.turn("hi")
    assert spk == 18 and "😁" not in spoken
    assert sink.count >= 2  # segments played individually, in order

    # pipelining off → one blob through the sink
    sink2 = FileSink(str(tmp_path / "off"))
    app2 = FeelMe(tiny_pipe, asr=None,
                  llm=ScriptedLLM(["One tiny tale. Then another tale follows after it. 😁"]),
                  sink=sink2, steps=2, language=None, pipelined=False)
    app2.language = None
    app2.turn("hi")
    assert sink2.count == 1


def test_file_sink_writes_valid_wav(tmp_path):
    from scipy.io import wavfile

    sink = FileSink(str(tmp_path), pattern="t{i}.wav")
    sink.play(np.zeros(100, np.float32), 22050)
    sr, data = wavfile.read(tmp_path / "t0.wav")
    assert sr == 22050 and len(data) == 100
