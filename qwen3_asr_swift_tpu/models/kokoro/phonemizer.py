"""Multilingual grapheme→phoneme front end for Kokoro.

TPU-native analog of the reference's in-repo phonemizers
(reference: Sources/KokoroTTS/Phonemizer.swift (673 lines) + per-language
phonemizers for Latin/Chinese/Japanese/Hindi): a dictionary-first English
G2P with rule-based letter-to-sound fallback, number expansion, and
punctuation → prosody marks; CJK falls back to per-character passthrough
units. Produces IPA-ish phoneme strings over Kokoro's symbol vocabulary.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Kokoro symbol set (StyleTTS2 convention): pad + punctuation + IPA letters.
_PAD = "$"
_PUNCT = ';:,.!?¡¿—…"«»“” '
_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_IPA = "ɑɐɒæɓʙβɔɕçɗɖðʤəɘɚɛɜɝɞɟʄɡɠɢʛɦɧħɥʜɨɪʝɭɬɫɮʟɱɯɰŋɳɲɴøɵɸθœɶʘɹɺɾɻʀʁɽʂʃʈʧʉʊʋⱱʌɣɤʍχʎʏʑʐʒʔʡʕʢǀǁǂǃˈˌːˑʼʴʰʱʲʷˠˤ˞↓↑→↗↘'̩'ᵻ"

SYMBOLS = [_PAD] + list(_PUNCT) + list(_LETTERS) + list(_IPA)
SYMBOL_TO_ID: Dict[str, int] = {s: i for i, s in enumerate(SYMBOLS)}
VOCAB_SIZE = len(SYMBOLS)

# Small exception dictionary (most-frequent irregulars); the rule engine
# below covers the regular long tail.
_DICT = {
    "the": "ðə", "a": "ɐ", "to": "tə", "of": "ʌv", "and": "ænd", "in": "ɪn",
    "is": "ɪz", "you": "juː", "that": "ðæt", "it": "ɪt", "he": "hiː",
    "she": "ʃiː", "was": "wʌz", "for": "fɔːɹ", "are": "ɑːɹ", "with": "wɪð",
    "his": "hɪz", "they": "ðeɪ", "be": "biː", "have": "hæv", "this": "ðɪs",
    "one": "wʌn", "what": "wʌt", "said": "sɛd", "do": "duː", "there": "ðɛɹ",
    "who": "huː", "been": "bɪn", "would": "wʊd", "were": "wɜːɹ", "two": "tuː",
    "could": "kʊd", "world": "wɜːld", "hello": "həlˈoʊ", "speech": "spiːʧ",
}

_RULES = [
    ("tion", "ʃən"), ("sion", "ʒən"), ("ough", "oʊ"), ("igh", "aɪ"),
    ("tch", "ʧ"), ("dge", "ʤ"), ("ing", "ɪŋ"), ("qu", "kw"), ("th", "θ"),
    ("sh", "ʃ"), ("ch", "ʧ"), ("ph", "f"), ("wh", "w"), ("ck", "k"),
    ("ee", "iː"), ("oo", "uː"), ("ea", "iː"), ("ou", "aʊ"), ("ow", "oʊ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"), ("ar", "ɑːɹ"),
    ("er", "ɚ"), ("or", "ɔːɹ"), ("a", "æ"), ("b", "b"), ("c", "k"),
    ("d", "d"), ("e", "ɛ"), ("f", "f"), ("g", "ɡ"), ("h", "h"), ("i", "ɪ"),
    ("j", "ʤ"), ("k", "k"), ("l", "l"), ("m", "m"), ("n", "n"), ("o", "ɑ"),
    ("p", "p"), ("r", "ɹ"), ("s", "s"), ("t", "t"), ("u", "ʌ"), ("v", "v"),
    ("w", "w"), ("x", "ks"), ("y", "j"), ("z", "z"),
]

_ONES = "zero one two three four five six seven eight nine".split()
_TEENS = "ten eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen".split()
_TENS = "zero ten twenty thirty forty fifty sixty seventy eighty ninety".split()


def number_to_words(n: int) -> str:
    if n < 10:
        return _ONES[n]
    if n < 20:
        return _TEENS[n - 10]
    if n < 100:
        return _TENS[n // 10] + (" " + _ONES[n % 10] if n % 10 else "")
    if n < 1000:
        rest = n % 100
        return _ONES[n // 100] + " hundred" + (" " + number_to_words(rest) if rest else "")
    if n < 1_000_000:
        rest = n % 1000
        return number_to_words(n // 1000) + " thousand" + (" " + number_to_words(rest) if rest else "")
    return " ".join(number_to_words(int(d)) for d in str(n))


def _word_to_phonemes(word: str) -> str:
    lw = word.lower()
    if lw in _DICT:
        return _DICT[lw]
    out = []
    i = 0
    while i < len(lw):
        # silent final e
        if lw[i] == "e" and i == len(lw) - 1 and len(lw) > 2:
            break
        for pat, rep in _RULES:
            if lw.startswith(pat, i):
                out.append(rep)
                i += len(pat)
                break
        else:
            i += 1
    return "".join(out)


def phonemize(text: str, language: str = "en") -> str:
    """text → phoneme string over the Kokoro symbol set.

    zh/ja/hi route to the dedicated phonemizers (reference:
    ChinesePhonemizer / JapanesePhonemizer / HindiPhonemizer — see
    phonemizer_i18n.py for the platform-free table equivalents)."""
    lang = language.lower()
    if lang.startswith("zh"):
        from .phonemizer_i18n import phonemize_zh

        return phonemize_zh(text)
    if lang.startswith("ja"):
        from .phonemizer_i18n import phonemize_ja

        return phonemize_ja(text)
    if lang.startswith("hi"):
        from .phonemizer_i18n import phonemize_hi

        return phonemize_hi(text)
    if lang.startswith("ko"):
        # no dedicated Korean phonemizer in the reference either —
        # per-character passthrough keeps hangul synthesizable
        return " ".join(ch for ch in text if not ch.isspace())

    text = re.sub(r"\d+", lambda m: number_to_words(int(m.group())), text)
    parts: List[str] = []
    for token in re.findall(r"[A-Za-z']+|[;:,.!?]", text):
        if re.match(r"[;:,.!?]", token):
            parts.append(token)
        else:
            parts.append(_word_to_phonemes(token.replace("'", "")))
    return " ".join(parts)


def phonemes_to_ids(phonemes: str) -> List[int]:
    return [SYMBOL_TO_ID[c] for c in phonemes if c in SYMBOL_TO_ID]
