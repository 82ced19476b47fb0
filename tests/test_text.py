import numpy as np

from emojivoice_tpu.text import cleaned_text_to_sequence, encode, sequence_to_text, text_to_sequence
from emojivoice_tpu.text.cleaners import (
    apply_replacements,
    basic_cleaners,
    collapse_whitespace,
    expand_abbreviations,
    phonemizer_backend,
)
from emojivoice_tpu.text.symbols import PAD_ID, SPACE_ID, symbols


def test_symbol_table_exact():
    # Must match the reference fork's table byte-for-byte.  Note the fork
    # quirk: the table has 198 entries (fork-extended IPA set, with a
    # duplicated "'"), while configs/model/matcha.yaml still says
    # n_vocab: 178 — ids ≥ 178 would overflow the embedding; they never
    # occur in espeak output for the shipped languages.
    assert len(symbols) == 198
    assert symbols[0] == "_"
    assert PAD_ID == 0
    assert symbols[SPACE_ID] == " "
    # spot-check a few ids against the reference ordering
    assert symbols[1] == ";"
    assert symbols.index("A") == 17
    assert symbols.index("a") == 43


def test_basic_cleaners():
    assert basic_cleaners("Hello   WORLD\t!") == "hello world !"


def test_abbreviations_en():
    out = expand_abbreviations("dr. smith and mr. jones", "en")
    assert out == "doctor smith and mister jones"


def test_replacements_en():
    assert "5 dollars and 45 cents" in apply_replacements("$5.45", "en")
    assert apply_replacements("3.14", "en") == "3 point 14"
    assert apply_replacements("wait...", "en") == "wait..."


def test_collapse_whitespace():
    assert collapse_whitespace("a  b\n c") == "a b c"


def test_text_to_sequence_roundtrip():
    ids, cleaned = text_to_sequence("hello world.", ["basic_cleaners"])
    assert sequence_to_text(ids) == "hello world."
    assert cleaned_text_to_sequence(cleaned) == ids


def test_encode_intersperse_and_pad():
    x, length, cleaned = encode("ab", ["basic_cleaners"], add_blank=True, pad_to=16)
    assert x.shape == (1, 16)
    assert int(length[0]) == 5  # _a_b_
    assert x.dtype == np.int32
    assert (x[0, 5:] == PAD_ID).all()
    # blanks interleaved
    assert x[0, 0] == PAD_ID and x[0, 2] == PAD_ID and x[0, 4] == PAD_ID


def test_phonemizer_backend_reports():
    assert phonemizer_backend("en") in ("espeak", "grapheme")
    assert phonemizer_backend("ja") in ("misaki", "grapheme")


def test_unknown_symbols_skipped():
    ids, _ = text_to_sequence("héllo", ["basic_cleaners"])  # é not in table
    assert sequence_to_text(ids) == "hllo"


def test_grapheme_fallback_transliterates_accents():
    """Accented Latin letters map to base letters instead of being dropped
    (était → etait, not tait); ß → ss, œ → oe."""
    from emojivoice_tpu.text.cleaners import french_cleaners, german_cleaners

    assert french_cleaners("Il était une fois, un œuf.") == "il etait une fois, un oeuf."
    assert german_cleaners("Große Straße.") == "grosse strasse."


def test_japanese_grapheme_fallback_romanizes_kana():
    """Without misaki, kana transliterate to romaji instead of vanishing
    (the old fallback produced EMPTY text → silent synthesis for ja)."""
    from emojivoice_tpu.text.cleaners import japanese_cleaners

    out = japanese_cleaners("むかしむかし、ロボットが！")
    assert out == "mukashimukashi, robottoga!"


def test_kana_to_romaji_coverage():
    from emojivoice_tpu.text.kana import kana_to_romaji

    cases = {
        "きゃくしゃ": "kyakusha",   # digraph
        "ちょっと": "chotto",       # sokuon + ch digraph → tch... 'chotto'
        "がっこう": "gakkou",       # sokuon gemination
        "コーヒー": "koohii",       # katakana fold + long-vowel mark
        "じゃあね": "jaane",        # j absorbs the y
        "しんぶん": "shinbun",
        "ヴァイオリン": "vaiorin",
    }
    for kana, expected in cases.items():
        assert kana_to_romaji(kana) == expected, (kana, kana_to_romaji(kana))
    # non-kana passes through untouched
    assert kana_to_romaji("abc 123") == "abc 123"


def test_symbol_map_first_occurrence_wins():
    """The table's five "'" entries map to id 174 (inside the trained
    n_vocab=178 rows); the reference's later-wins dict yields 182, which
    indexes past its own embedding on any raw apostrophe."""
    from emojivoice_tpu import text as textlib

    ids, _ = textlib.text_to_sequence("don't", ("basic_cleaners",))
    assert 174 in ids and all(i < 178 for i in ids)


def test_untrained_ids_filtered():
    """Symbols that only exist in the untrained tail (ids >= n_vocab: '-',
    '%', brackets) are skipped like unknown characters instead of producing
    NaN embeddings downstream."""
    from emojivoice_tpu import text as textlib
    from emojivoice_tpu.text.symbols import N_VOCAB, symbols

    tail = "".join(s for s in dict.fromkeys(symbols[N_VOCAB:]))
    ids = textlib.cleaned_text_to_sequence("a" + tail + "b")
    assert all(i < N_VOCAB for i in ids)
    assert len([i for i in ids]) >= 2  # a and b survive


def test_grapheme_fallback_hyphen_keeps_word_boundary():
    from emojivoice_tpu.text.cleaners import english_cleaners2

    assert english_cleaners2("well-known facts") == "well known facts"
