#!/usr/bin/env python
"""Regenerate tests/fixtures/cleaner_corpus.json.

Freezes the deterministic pre-phonemize pipeline (lowercase → abbreviation
expansion → symbol/currency replacements → whitespace collapse, reference:
Matcha-TTS/matcha/text/cleaners.py:78-299) over a corpus that exercises
every branch: each abbreviation, currency with/without cents, decimals,
ellipsis, letter-dot-letter, slashes/equals, negative numbers, Mme/Mlle,
messy whitespace.  The espeak stage is replaced by an echo backend, so the
recorded `pre_phonemize` is exactly what would cross the process boundary
into espeak-ng, and `grapheme` is the full-pipeline output in this image's
fallback mode (symbol-table-filtered).

Run after any deliberate cleaner change:  python tools/gen_cleaner_goldens.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = {
    "en": [
        "Hello there, how are you today?",
        "Dr. Smith lives on St. James street.",
        "Mr. and Mrs. Brown met Ms. Jones.",
        "Gen. Patton spoke to Lt. Dan and Sgt. Pepper.",
        "Capt. Picard, Col. Mustard, and Maj. Tom agree.",
        "The Rev. Green and the Hon. Judge arrived.",
        "Jr. engineers at the Co. earn less than Drs. do.",
        "Esq. is rare; Ltd. companies are common near Ft. Knox.",
        "It costs $5.50 at the store.",
        "That's $100 even, not €20.",
        "She paid €9.99 for shipping.",
        "A bowl of ramen is ¥800 in Tokyo.",
        "The watch was ¥1200.50 on sale.",
        "Pi is 3.14159 approximately.",
        "Version 2.0 shipped; version 2.1.3 is next.",
        "Visit example.com for details.",
        "Send mail to a.b at the office.",
        "Well... I am not sure...",
        "Wait... $3.50 for a coffee... really?",
        "One, two, three... go!",
        "The U.S.A. is large.",
        "I have 99 problems.",
        "Room 101 is on floor 3.",
        "He said \"stop!\" and left.",
        "Spaces   should    collapse.",
        "Tabs\tand\nnewlines too.",
        "A hyphen-ated word stays.",
        "What?! Both marks survive.",
        "Quote 'single' and \"double\" marks.",
        "Mixed: Dr. Who owes $9.99... honestly.",
        "St. Mary's Co. charges $15 per visit.",
        "A semicolon; a colon: both kept.",
    ],
    "fr": [
        "Bonjour tout le monde!",
        "Le Dr. Dupont est arrivé.",
        # the reference's ("m.", "monsieur") tuple builds \bm.\. — the dot in
        # the abbr acts as a wildcard, so "mr." matches it (quirk, locked)
        "Mr. Lefèvre est arrivé hier.",
        "St. Michel est une place célèbre.",
        "Mme Bernard et Mlle Petit sont là.",
        "Ça coûte 5.50$ au marché.",
        "Le livre coûte 9.99€ en ligne.",
        "Un bol de ramen coûte 800¥ à Tokyo.",
        "Le total est 12,5 pour cent.",
        "Attends... je réfléchis...",
        "Le site (très utile) est fermé.",
        "Deux = deux, c'est vrai.",
        "Le chemin a/b est bloqué.",
        "La température est -5 degrés.",
        "Il a dit: «bonjour» à tous.",
        "Les   espaces   multiples   disparaissent.",
        "C'est la vie, n'est-ce pas?",
        "L'équation x = y/2 est simple.",
        "Elle a payé 20€ et 3¥.",
        "Un point a.b entre lettres.",
        "Version 1.2 du logiciel.",
        "Trois... deux... un... partez!",
        "Mme Curie a gagné deux prix Nobel.",
        "Le café coûte 2,50 euros.",
        "Quelle belle journée aujourd'hui!",
    ],
    "de": [
        "Guten Tag, wie geht es Ihnen?",
        "Hr. Müller und Fr. Schmidt sind hier.",
        "Dr. Weber und Prof. Braun lehren.",
        "Das ist z.B. ein Beispiel.",
        "Ein Bsp. dafür steht unten.",
        "Usw. bedeutet und so weiter.",
        "Es kostet ca. zehn Euro.",
        "Bzw. die andere Variante.",
        "D.h. wir kommen morgen.",
        "U.a. auch dieses Buch.",
        "U.u. regnet es später.",
        "U.v.m. steht am Ende.",
        "Vgl. die zweite Auflage.",
        "Das Buch kostet 9.99€ online.",
        "Der Kaffee kostet 5.50$ dort.",
        "Ein Ramen kostet 800¥ in Tokio.",
        "Der Anteil ist 12,5 Prozent.",
        "Warte... ich denke nach...",
        "Der Satz (in Klammern) verschwindet.",
        "Zwei = zwei stimmt immer.",
        "Der Pfad a/b ist gesperrt.",
        "Es sind -5 Grad draußen.",
        "Mme und Mlle sind französisch.",
        "Viele   Leerzeichen   verschwinden.",
        "Ein Punkt a.b zwischen Buchstaben.",
        "Version 1.2 der Software.",
        "Drei... zwei... eins... los!",
    ],
    "es": [
        "Hola, ¿cómo estás hoy?",
        "Buenos días a todos.",
        "El café cuesta cinco euros.",
        "Espera... estoy pensando...",
        "Los   espacios   se   colapsan.",
        "¡Qué día tan bonito!",
        "La versión 1.2 del programa.",
        "Tres... dos... uno... ¡vamos!",
        "El camino está bloqueado.",
        "Una palabra con guión-medio.",
        "Ella dijo: hola a todos.",
        "¿Cuánto cuesta el libro?",
        "Mañana será otro día.",
        "El niño juega en el jardín.",
    ],
    "ja": [
        "こんにちは、元気ですか。",
        "コーヒーは3.5ドルです。",
        "合計は100%です。",
        "メールはa@bです。",
        "パスはa/bです。",
        "1+1=2です。",
        "円は¥マークです。",
        "ユーロは€です。",
        "これは\\\\テストです。",
        "値段は-5円です。",
        "きょうはいい天気です。",
        "ありがとうございます。",
    ],
}


def main():
    from emojivoice_tpu.text import cleaners

    recorded = []

    class Echo:
        def phonemize(self, texts, strip=True, njobs=1):
            recorded.extend(texts)
            return list(texts)

    lang_fns = {
        "en": cleaners.english_cleaners2,
        "fr": cleaners.french_cleaners,
        "de": cleaners.german_cleaners,
        "es": cleaners.spanish_cleaners,
        "ja": cleaners.japanese_cleaners,
    }

    out = {}
    for lang, sentences in CORPUS.items():
        entries = []
        for text in sentences:
            # echo espeak: record exactly what crosses the process boundary
            recorded.clear()
            orig = cleaners._espeak_backend
            cleaners._espeak_backend = lambda language: Echo()
            try:
                echoed = lang_fns[lang](text)
            finally:
                cleaners._espeak_backend = orig
            pre = recorded[0] if recorded else None  # ja: no espeak stage

            # grapheme mode: this image's real fallback output
            cleaners._espeak_backend = lambda language: None
            try:
                grapheme = lang_fns[lang](text)
            finally:
                cleaners._espeak_backend = orig
            entries.append({"text": text, "pre_phonemize": pre,
                            "cleaned_echo": echoed, "grapheme": grapheme})
        out[lang] = entries

    path = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "cleaner_corpus.json"
    path.write_text(json.dumps(out, indent=1, ensure_ascii=False) + "\n")
    n = sum(len(v) for v in out.values())
    print(f"wrote {path} ({n} entries over {len(out)} languages)")


if __name__ == "__main__":
    main()
