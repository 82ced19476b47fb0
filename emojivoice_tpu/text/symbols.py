"""Symbol vocabulary.

This table is *data*, not code: it must match the reference byte-for-byte
(reference: Matcha-TTS/matcha/text/symbols.py:5-17, itself from
keithito/tacotron) or embedding ids in released checkpoints would be
scrambled.

Fork quirk (reproduced deliberately): the fork extended the IPA set so the
table has 198 entries (including a duplicated "'"), while the model config
still declares ``n_vocab: 178`` (configs/model/matcha.yaml:9).  Ids ≥ 178
would overflow the embedding; they never occur in espeak output for the
shipped languages, and lookups keep first-occurrence ids like the
reference's dict construction does.
"""

_pad = "_"
_punctuation = ';:,.!?¡¿—…"«»“” '
_letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_letters_ipa = (
    "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ'̃'-'̞ᵝʨʦũĩʣʥ%+]\\()["
)

symbols = [_pad] + list(_punctuation) + list(_letters) + list(_letters_ipa)

PAD_ID = 0
SPACE_ID = symbols.index(" ")
