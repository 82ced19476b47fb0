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
