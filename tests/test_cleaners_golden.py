"""Golden-espeak regression lock for the phonemizer code path.

The image has no espeak-ng, so the espeak pipelines normally fall back to
grapheme mode and the espeak branch never executes.  These tests drive that
branch with a fake backend fed from tests/fixtures/espeak_golden.json:

* the ``captured`` entry is REAL espeak-ng output recovered from the
  reference repo's own committed notebook output (reference:
  /synthesis.ipynb cell 18) — an end-to-end byte-exact pin including the
  blank-interspersed id sequence;
* ``mock_*`` entries lock the deterministic pre-phonemize pipeline
  (lowercase → abbreviations → replacements, reference:
  Matcha-TTS/matcha/text/cleaners.py:248-300) and lossless IPA→id mapping.
"""

import json
import os

import pytest

from emojivoice_tpu.text import cleaned_text_to_sequence, sequence_to_text, text_to_sequence
from emojivoice_tpu.text import cleaners
from emojivoice_tpu.text.symbols import PAD_ID, symbols
from emojivoice_tpu.utils.masks import intersperse

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "espeak_golden.json")

with open(FIXTURE) as f:
    GOLDEN = json.load(f)


class _FakeEspeak:
    """Stands in at the phonemizer process boundary: text in → golden IPA out."""

    def __init__(self, language, table):
        self.language = language
        self.table = table  # pre_phonemize text -> espeak output
        self.seen = []

    def phonemize(self, texts, strip=True, njobs=1):
        assert strip and njobs == 1  # reference call convention (cleaners.py:248-257)
        self.seen.extend(texts)
        return [self.table[t] for t in texts]


@pytest.fixture
def fake_espeak(monkeypatch):
    def install(language, table):
        fake = _FakeEspeak(language, table)

        def backend(lang):
            assert lang == language, f"wrong espeak voice requested: {lang}"
            return fake

        monkeypatch.setattr(cleaners, "_espeak_backend", backend)
        return fake

    return install


def test_captured_reference_espeak_end_to_end(fake_espeak):
    """Byte-exact replay of the reference's committed espeak output."""
    entry = GOLDEN["captured"][0]
    pre = entry["text"].lower()  # no abbreviations/symbols in this sentence
    fake = fake_espeak("en-us", {pre: entry["espeak"]})

    cleaned = cleaners.english_cleaners2(entry["text"])
    assert fake.seen == [pre]
    assert cleaned == entry["espeak"]

    ids, _ = text_to_sequence(entry["text"], ["english_cleaners2"])
    # nothing outside the 178-symbol table was dropped
    assert len(ids) == len(entry["espeak"])
    # the blank-interspersed rendering matches the notebook byte-for-byte
    assert sequence_to_text(intersperse(ids, PAD_ID)) == entry["interspersed"]


def test_mock_en_pre_phonemize_and_id_mapping(fake_espeak):
    table = {e["pre_phonemize"]: e["espeak"] for e in GOLDEN["mock_en"]}
    fake = fake_espeak("en-us", table)
    for entry in GOLDEN["mock_en"]:
        cleaned = cleaners.english_cleaners2(entry["text"])
        assert cleaned == entry["espeak"], entry["text"]
        # lossless mapping: every espeak-style char has a symbol id
        ids = cleaned_text_to_sequence(cleaned)
        assert len(ids) == len(cleaned), entry["text"]
        assert sequence_to_text(ids) == cleaned
    assert fake.seen == [e["pre_phonemize"] for e in GOLDEN["mock_en"]]


def test_mock_fr_pre_phonemize(fake_espeak):
    table = {e["pre_phonemize"]: e["pre_phonemize"] for e in GOLDEN["mock_fr"]}
    fake = fake_espeak("fr-fr", table)
    for entry in GOLDEN["mock_fr"]:
        cleaners.french_cleaners(entry["text"])
    assert fake.seen == [e["pre_phonemize"] for e in GOLDEN["mock_fr"]]


def test_symbol_table_covers_espeak_en_inventory():
    """Every IPA char appearing in the reference's real captured output is in
    our byte-exact symbol table (symbols.py) — the property that makes the
    released checkpoints loadable without id drift."""
    inventory = set(GOLDEN["captured"][0]["espeak"])
    assert inventory <= set(symbols)


# ---------------------------------------------------------------------------
# Broad regression corpus (tests/fixtures/cleaner_corpus.json, regenerate
# with tools/gen_cleaner_goldens.py after deliberate cleaner changes):
# 100+ sentences over en/fr/de/es/ja covering every abbreviation, currency
# with/without cents, decimals, ellipsis, letter-dot-letter, slash/equals,
# negative numbers, Mme/Mlle, messy whitespace
# (reference branches: Matcha-TTS/matcha/text/cleaners.py:78-299).
# ---------------------------------------------------------------------------

CORPUS_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "cleaner_corpus.json")

with open(CORPUS_FIXTURE) as _f:
    CORPUS = json.load(_f)

_LANG_FN = {
    "en": cleaners.english_cleaners2,
    "fr": cleaners.french_cleaners,
    "de": cleaners.german_cleaners,
    "es": cleaners.spanish_cleaners,
    "ja": cleaners.japanese_cleaners,
}
_ESPEAK_VOICE = {"en": "en-us", "fr": "fr-fr", "de": "de", "es": "es"}


@pytest.mark.parametrize("lang", sorted(CORPUS))
def test_corpus_pre_phonemize_locked(lang, monkeypatch):
    """The deterministic pre-espeak pipeline (lowercase → abbreviations →
    replacements) is locked byte-exact on every corpus sentence: this text
    is exactly what crosses the process boundary into espeak-ng."""
    recorded = []

    class Echo:
        def phonemize(self, texts, strip=True, njobs=1):
            assert strip and njobs == 1
            recorded.extend(texts)
            return list(texts)

    if lang in _ESPEAK_VOICE:
        monkeypatch.setattr(cleaners, "_espeak_backend", lambda language: Echo())
    for entry in CORPUS[lang]:
        recorded.clear()
        out = _LANG_FN[lang](entry["text"])
        assert out == entry["cleaned_echo"], entry["text"]
        if entry["pre_phonemize"] is not None:
            assert recorded == [entry["pre_phonemize"]], entry["text"]


@pytest.mark.parametrize("lang", sorted(CORPUS))
def test_corpus_grapheme_mode_locked_and_maps_to_symbols(lang, monkeypatch):
    """Grapheme fallback (this image's real mode): output locked, and the
    property that EVERY output char maps into the 178-symbol table — so
    text_to_sequence is lossless and round-trips."""
    monkeypatch.setattr(cleaners, "_espeak_backend", lambda language: None)
    table = set(symbols)
    for entry in CORPUS[lang]:
        out = _LANG_FN[lang](entry["text"])
        assert out == entry["grapheme"], entry["text"]
        assert set(out) <= table, entry["text"]
        ids = cleaned_text_to_sequence(out)
        assert len(ids) == len(out)
        assert sequence_to_text(ids) == out


def test_corpus_covers_every_abbreviation():
    """Self-check on the corpus itself: each abbreviation regex fires on at
    least one sentence per language (coverage, not behavior)."""
    for lang, abbrs in cleaners._ABBREVIATIONS.items():
        sentences = " ".join(e["text"].lower() for e in CORPUS[lang])
        missed = [rx.pattern for rx, _ in abbrs if not rx.search(sentences)]
        assert not missed, f"{lang}: no corpus sentence exercises {missed}"
