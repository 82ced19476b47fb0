from emojivoice_tpu.text.numbers import (
    expand_numbers_en,
    number_to_words,
    ordinal_to_words,
    year_to_words,
)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(15) == "fifteen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(101) == "one hundred one"
    assert number_to_words(999) == "nine hundred ninety nine"
    assert number_to_words(1000) == "one thousand"
    assert number_to_words(1234567) == "one million two hundred thirty four thousand five hundred sixty seven"
    assert number_to_words(-5) == "minus five"


def test_ordinals():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(2) == "second"
    assert ordinal_to_words(3) == "third"
    assert ordinal_to_words(4) == "fourth"
    assert ordinal_to_words(12) == "twelfth"
    assert ordinal_to_words(20) == "twentieth"
    assert ordinal_to_words(21) == "twenty first"


def test_years():
    assert year_to_words(1985) == "nineteen eighty five"
    assert year_to_words(2024) == "twenty twenty four"
    assert year_to_words(1900) == "nineteen hundred"
    assert year_to_words(2000) == "two thousand"
    assert year_to_words(2007) == "twenty oh seven"


def test_expand_numbers_en():
    assert expand_numbers_en("I have 3 cats") == "I have three cats"
    assert expand_numbers_en("the 2nd time") == "the second time"
    assert expand_numbers_en("born in 1985") == "born in nineteen eighty five"
    assert expand_numbers_en("pi is 3.14") == "pi is three point one four"
    assert expand_numbers_en("1,234 items") == "one thousand two hundred thirty four items"


def test_cleaner_wiring():
    from emojivoice_tpu.text import text_to_sequence

    ids, cleaned = text_to_sequence("I have 12 hats.", ["expand_numbers_en", "basic_cleaners"])
    assert cleaned == "i have twelve hats."
