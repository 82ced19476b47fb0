"""Text → symbol-id sequences.

Behavioral equivalent of the reference front end
(reference: Matcha-TTS/matcha/text/__init__.py:10-44) with one addition:
``encode`` bundles cleaning, id lookup, blank interspersal, and bucket
padding into the single host-side entry the synthesis pipeline uses.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from emojivoice_tpu.text import cleaners as cleaners
from emojivoice_tpu.text.symbols import N_VOCAB, PAD_ID, symbols
from emojivoice_tpu.utils.masks import intersperse

# FIRST occurrence wins for the table's duplicated symbols ("'" appears five
# times): the first id (174) is inside the trained n_vocab=178 rows, while
# the reference's later-wins comprehension maps "'" to 182 and would index
# past its own embedding (symbols.py quirk note)
_symbol_to_id: dict = {}
for _i, _s in enumerate(symbols):
    _symbol_to_id.setdefault(_s, _i)
_id_to_symbol = dict(enumerate(symbols))


def text_to_sequence(text: str, cleaner_names: Sequence[str]):
    """Clean text and convert each resulting symbol to its id.

    Returns (ids, cleaned_text) like the reference.  Unknown symbols (e.g.
    espeak output outside the table) are skipped with the same effect as the
    reference's KeyError-free lookup path expects clean input; skipping keeps
    robustness for arbitrary LLM output.  Ids ≥ n_vocab (table entries with
    no trained embedding row — the embedding lookup would NaN-fill, the
    reference would crash) are skipped the same way.
    """
    clean_text = _clean_text(text, cleaner_names)
    sequence = [i for ch in clean_text
                if (i := _symbol_to_id.get(ch, N_VOCAB)) < N_VOCAB]
    return sequence, clean_text


def cleaned_text_to_sequence(cleaned_text: str):
    return [i for ch in cleaned_text
            if (i := _symbol_to_id.get(ch, N_VOCAB)) < N_VOCAB]


def sequence_to_text(sequence) -> str:
    return "".join(_id_to_symbol[int(i)] for i in sequence)


def _clean_text(text: str, cleaner_names: Sequence[str]) -> str:
    for name in cleaner_names:
        text = cleaners.get_cleaner(name)(text)
    return text


def encode(
    text: str,
    cleaner_names: Sequence[str] = ("english_cleaners2",),
    add_blank: bool = True,
    pad_to: Optional[int] = None,
):
    """Full host-side text pipeline → (ids ndarray (1, L_pad), length, cleaned).

    Matches the reference call-site composition: text_to_sequence +
    intersperse(blank=0) (reference: cli.py:50-58) + pad to a static bucket.
    """
    ids, cleaned = text_to_sequence(text, cleaner_names)
    if add_blank:
        ids = intersperse(ids, PAD_ID)
    length = len(ids)
    if pad_to is not None:
        if length > pad_to:
            raise ValueError(f"Sequence length {length} exceeds bucket {pad_to}")
        ids = ids + [PAD_ID] * (pad_to - length)
    x = np.asarray(ids, dtype=np.int32)[None, :]
    return x, np.asarray([length], dtype=np.int32), cleaned
