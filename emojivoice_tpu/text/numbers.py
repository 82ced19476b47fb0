"""English number → words expansion.

The reference vendors an inflect-based ``numbers.py`` but never wires it
into its cleaners (SURVEY.md §2.3); here the expansion is implemented in
pure Python (no inflect in the image) and *is* wired: add
``"expand_numbers_en"`` to a cleaner list, or rely on
``english_cleaners2``'s currency tables for money amounts.

Covers: integers (scale names to decillions), ordinals (1st/2nd/...),
years (1985 → nineteen eighty five), decimals via 'point', commas in
groups.
"""

from __future__ import annotations

import re

_UNITS = ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine",
          "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen", "sixteen",
          "seventeen", "eighteen", "nineteen"]
_TENS = ["", "", "twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty", "ninety"]
_SCALES = ["", " thousand", " million", " billion", " trillion", " quadrillion",
           " quintillion", " sextillion", " septillion", " octillion", " nonillion",
           " decillion"]

_ORDINAL_UNITS = {
    "one": "first", "two": "second", "three": "third", "five": "fifth",
    "eight": "eighth", "nine": "ninth", "twelve": "twelfth",
}

_comma_number_re = re.compile(r"(\d[\d,]*\d)")
_decimal_re = re.compile(r"(\d+)\.(\d+)")
_ordinal_re = re.compile(r"(\d+)(st|nd|rd|th)\b")
_year_re = re.compile(r"\b(1[5-9]\d\d|20\d\d)\b")
_number_re = re.compile(r"\d+")


def _three_digits(n: int) -> str:
    assert 0 <= n < 1000
    if n < 20:
        return _UNITS[n]
    if n < 100:
        t, u = divmod(n, 10)
        return _TENS[t] + (f" {_UNITS[u]}" if u else "")
    h, rest = divmod(n, 100)
    out = f"{_UNITS[h]} hundred"
    if rest:
        out += f" {_three_digits(rest)}"
    return out


def number_to_words(n: int) -> str:
    if n < 0:
        return "minus " + number_to_words(-n)
    if n == 0:
        return "zero"
    groups = []
    scale = 0
    while n > 0 and scale < len(_SCALES):
        n, g = divmod(n, 1000)
        if g:
            groups.append(_three_digits(g) + _SCALES[scale])
        scale += 1
    if n > 0:  # beyond decillions: read digit by digit
        groups.append(" ".join(_UNITS[int(d)] for d in str(n)))
    return " ".join(reversed(groups))


def ordinal_to_words(n: int) -> str:
    words = number_to_words(n)
    parts = words.rsplit(" ", 1)
    last = parts[-1]
    if last in _ORDINAL_UNITS:
        parts[-1] = _ORDINAL_UNITS[last]
    elif last.endswith("y"):
        parts[-1] = last[:-1] + "ieth"
    else:
        parts[-1] = last + "th"
    return " ".join(parts)


def year_to_words(n: int) -> str:
    if n % 1000 == 0:
        return number_to_words(n)
    if n % 100 == 0:
        return f"{number_to_words(n // 100)} hundred"
    hi, lo = divmod(n, 100)
    if lo < 10:
        return f"{number_to_words(hi)} oh {_UNITS[lo]}"
    return f"{number_to_words(hi)} {_three_digits(lo)}"


def expand_numbers_en(text: str) -> str:
    text = _comma_number_re.sub(lambda m: m.group(1).replace(",", ""), text)
    text = _ordinal_re.sub(lambda m: ordinal_to_words(int(m.group(1))), text)
    text = _year_re.sub(lambda m: year_to_words(int(m.group(1))), text)
    text = _decimal_re.sub(
        lambda m: f"{number_to_words(int(m.group(1)))} point "
        + " ".join(_UNITS[int(d)] for d in m.group(2)),
        text,
    )
    text = _number_re.sub(lambda m: number_to_words(int(m.group(0))), text)
    return text
