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


def test_multilingual_cardinals():
    """In-language cardinal grammar: French vigesimals and et-un liaisons,
    German unit-before-ten compounding with eins/ein apocope, Spanish
    irregular hundreds and apocope before mil, Japanese myriad grouping with
    rendaku consonant changes (sanbyaku/roppyaku/hassen)."""
    from emojivoice_tpu.text.numbers import (number_to_words_de, number_to_words_es,
                                             number_to_words_fr, number_to_words_ja)

    assert number_to_words_fr(71) == "soixante et onze"
    assert number_to_words_fr(80) == "quatre-vingts"
    assert number_to_words_fr(81) == "quatre-vingt-un"
    assert number_to_words_fr(200) == "deux cents"
    assert number_to_words_fr(201) == "deux cent un"
    assert number_to_words_fr(1985) == "mille neuf cent quatre-vingt-cinq"
    assert number_to_words_fr(1000000) == "un million"

    assert number_to_words_de(21) == "einundzwanzig"
    assert number_to_words_de(101) == "einhunderteins"
    assert number_to_words_de(1001) == "eintausendeins"
    assert number_to_words_de(2024) == "zweitausendvierundzwanzig"
    assert number_to_words_de(30) == "dreißig"

    assert number_to_words_es(16) == "dieciséis"
    assert number_to_words_es(21) == "veintiuno"
    assert number_to_words_es(31) == "treinta y uno"
    assert number_to_words_es(100) == "cien"
    assert number_to_words_es(101) == "ciento uno"
    assert number_to_words_es(500) == "quinientos"
    assert number_to_words_es(21000) == "veintiún mil"
    assert number_to_words_es(2000000) == "dos millones"
    # the apocope applies before millones exactly as before mil
    assert number_to_words_es(21000000) == "veintiún millones"
    assert number_to_words_es(31000000) == "treinta y un millones"
    assert number_to_words_es(1000000000) == "mil millones"

    assert number_to_words_ja(11) == "juu ichi"
    assert number_to_words_ja(300) == "sanbyaku"
    assert number_to_words_ja(600) == "roppyaku"
    assert number_to_words_ja(800) == "happyaku"
    assert number_to_words_ja(3000) == "sanzen"
    assert number_to_words_ja(8000) == "hassen"
    assert number_to_words_ja(10000) == "ichi man"
    assert number_to_words_ja(20500) == "ni man gohyaku"
    # the myriad ladder continues at kei (10^16); past it a digit run is an
    # id/serial and reads digit by digit instead of raising KeyError
    assert number_to_words_ja(10 ** 16) == "ichi kei"
    assert number_to_words_ja(12345678901234567) == (
        "ichi kei nisen sanbyaku yonjuu go chou rokusen nanahyaku hachijuu "
        "kyuu oku hyaku nijuu san man yonsen gohyaku rokujuu nana")
    assert number_to_words_ja(10 ** 20) == ("ichi" + " zero" * 20)


def test_verbalize_numbers_grouping_and_versions():
    """Locale thousands grouping collapses before decimal handling, and
    multi-separator runs (versions, IPs, long serials) read component by
    component instead of leaving a separator glued between words."""
    from emojivoice_tpu.text.numbers import verbalize_numbers

    # German/Spanish/French group thousands with '.' — espeak reads these as
    # one number, not as a decimal
    assert verbalize_numbers("1.000 Euro", "de") == "eintausend Euro"
    # number_to_words_de lowercases its output (the grapheme fallback
    # lowercases downstream anyway)
    assert verbalize_numbers("1.000.000 Euro", "de") == "eine million Euro"
    assert verbalize_numbers("1.000,5 kg", "de") == "eintausend Komma fünf kg"
    assert verbalize_numbers("2.500 personas", "es") == "dos mil quinientos personas"
    # Japanese groups Western-style with ','
    assert verbalize_numbers("1,000 en", "ja") == "sen en"
    # English-style comma grouping with >=2 groups is unambiguous anywhere
    assert verbalize_numbers("1,000,000", "fr") == "un million"
    # a single comma group stays a decimal in comma-decimal locales
    assert verbalize_numbers("1,000", "fr") == "un virgule zéro zéro zéro"
    # version runs: every component spoken, no stray separator glued between
    assert verbalize_numbers("version 2.1.3", "fr") == "version deux virgule un virgule trois"
    assert verbalize_numbers("192.168.0.1", "de") == (
        "einhundertzweiundneunzig Komma einhundertachtundsechzig Komma null Komma eins")
    from emojivoice_tpu.text.numbers import expand_numbers_en

    assert expand_numbers_en("v2.1.3") == "vtwo point one point three"
    # a huge digit run must not crash any language's cleaner pipeline
    from emojivoice_tpu.text.cleaners import japanese_cleaners

    assert japanese_cleaners("12345678901234567です")


def test_verbalize_numbers_dispatch():
    """Decimals read digit-by-digit after the locale separator word; both
    '.' and ',' separate for non-English; unknown languages fall back to
    the English expander."""
    from emojivoice_tpu.text.numbers import verbalize_numbers

    assert verbalize_numbers("il y a 123 choses", "fr") == "il y a cent vingt-trois choses"
    assert verbalize_numbers("4,5 grammes", "fr") == "quatre virgule cinq grammes"
    assert verbalize_numbers("21,50 Euro", "de") == "einundzwanzig Komma fünf null Euro"
    assert verbalize_numbers("1.5 km", "es") == "uno coma cinco km"
    assert verbalize_numbers("3.5 desu", "ja") == "san ten go desu"
    assert verbalize_numbers("3 cats", "xx") == "three cats"


def test_grapheme_fallback_speaks_digits_every_language():
    """espeak is absent in this image, so the grapheme fallback is the live
    path — digits must verbalize in-language instead of being silently
    stripped by the symbol-table filter (they were, pre-round-3)."""
    from emojivoice_tpu.text.cleaners import (english_cleaners2, french_cleaners,
                                              german_cleaners, japanese_cleaners,
                                              spanish_cleaners)

    assert "one hundred twenty three" in english_cleaners2("I saw 123 birds")
    assert "cent vingt trois" in french_cleaners("Bonjour 123")
    assert "dreiundzwanzig" in german_cleaners("Es sind 23 Grad")
    assert "veintitres" in spanish_cleaners("Hay 23 gatos")
    assert "nijuu san" in japanese_cleaners("23です")
