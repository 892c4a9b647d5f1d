"""Japanese g2p: kana text -> IPA2 character list (reference: text/japanese.py).

The reference delegates phonemization to pyopenjtalk (the native Open JTalk
engine + its morphological dictionary), which is unavailable in this image.
This implementation converts kana (hiragana/katakana) to the same Open-JTalk
romaji phoneme strings directly, then applies the reference's exact
sokuon/hatsuon rewrites and romaji->IPA2 substitutions.

Known divergences (no morphological dictionary available):
  * kanji cannot be read — they are skipped with a warning; feed kana or
    pre-convert kanji upstream
  * pitch-accent arrows (↑ ↓) are not emitted (they require the accent
    dictionary); the symbol table still supports them
"""

from __future__ import annotations

import re
import warnings
from typing import List

# kana -> Open-JTalk-style romaji (phonemes concatenated, as the reference
# assembles them in japanese_to_romaji_with_accent, japanese.py:74-112)
_KANA_MAP = {
    # basic hiragana
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "i", "ゑ": "e", "を": "o", "ん": "N",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ゔ": "vu",
    # digraphs
    "きゃ": "kya", "きゅ": "kyu", "きょ": "kyo",
    "しゃ": "sha", "しゅ": "shu", "しょ": "sho",
    "ちゃ": "cha", "ちゅ": "chu", "ちょ": "cho",
    "にゃ": "nya", "にゅ": "nyu", "にょ": "nyo",
    "ひゃ": "hya", "ひゅ": "hyu", "ひょ": "hyo",
    "みゃ": "mya", "みゅ": "myu", "みょ": "myo",
    "りゃ": "rya", "りゅ": "ryu", "りょ": "ryo",
    "ぎゃ": "gya", "ぎゅ": "gyu", "ぎょ": "gyo",
    "じゃ": "ja", "じゅ": "ju", "じょ": "jo",
    "ぢゃ": "ja", "ぢゅ": "ju", "ぢょ": "jo",
    "びゃ": "bya", "びゅ": "byu", "びょ": "byo",
    "ぴゃ": "pya", "ぴゅ": "pyu", "ぴょ": "pyo",
    "ふぁ": "fa", "ふぃ": "fi", "ふぇ": "fe", "ふぉ": "fo",
    "うぃ": "wi", "うぇ": "we", "うぉ": "wo",
    "てぃ": "ti", "でぃ": "di", "とぅ": "tu", "どぅ": "du",
    "しぇ": "she", "ちぇ": "che", "じぇ": "je",
    "ヴ": "vu",
    # small vowels standalone
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
}
_SOKUON = "っ"
_CHOUON = "ー"

_HIRA_START, _HIRA_END = 0x3041, 0x3096
_KATA_START, _KATA_END = 0x30A1, 0x30F6

_japanese_marks = re.compile(
    r"[^A-Za-z\d々぀-ヿ一-鿿１-９Ａ-Ｚａ-ｚｦ-ﾝ]"
)

_symbols_to_japanese = [(re.compile("％"), "パーセント")]

_romaji_to_ipa2 = [
    (re.compile(p), r)
    for p, r in [
        ("u", "ɯ"), ("ʧ", "tʃ"), ("j", "dʑ"), ("y", "j"), ("ni", "n^i"),
        ("nj", "n^"), ("hi", "çi"), ("hj", "ç"), ("f", "ɸ"), ("I", "i*"),
        ("U", "ɯ*"), ("r", "ɾ"),
    ]
]

_real_sokuon = [
    (re.compile(p), r)
    for p, r in [
        (r"Q([↑↓]*[kg])", r"k#\1"), (r"Q([↑↓]*[tdjʧ])", r"t#\1"),
        (r"Q([↑↓]*[sʃ])", r"s\1"), (r"Q([↑↓]*[pb])", r"p#\1"),
    ]
]

_real_hatsuon = [
    (re.compile(p), r)
    for p, r in [
        (r"N([↑↓]*[pbm])", r"m\1"), (r"N([↑↓]*[ʧʥj])", r"n^\1"),
        (r"N([↑↓]*[tdn])", r"n\1"), (r"N([↑↓]*[kg])", r"ŋ\1"),
    ]
]

_VOWELS = "aiueoIU"


def _kata_to_hira(text: str) -> str:
    return "".join(
        chr(ord(c) - 0x60) if _KATA_START <= ord(c) <= _KATA_END else c for c in text
    )


def kana_to_romaji(text: str) -> str:
    """Kana span -> Open-JTalk-style romaji with ʧ/ʃ/Q substitutions applied
    (matching the assembly in reference japanese.py:85-92)."""
    text = _kata_to_hira(text.replace("ー", _CHOUON))
    out: List[str] = []
    skipped_kanji = False
    i = 0
    while i < len(text):
        two = text[i : i + 2]
        ch = text[i]
        if two in _KANA_MAP:
            out.append(_KANA_MAP[two])
            i += 2
            continue
        if ch == _SOKUON:
            out.append("cl")
        elif ch == _CHOUON:
            # chouon: repeat previous vowel
            prev = out[-1] if out else ""
            if prev and prev[-1] in "aiueo":
                out.append(prev[-1])
        elif ch in _KANA_MAP:
            out.append(_KANA_MAP[ch])
        elif 0x4E00 <= ord(ch) <= 0x9FFF or ch == "々":
            skipped_kanji = True
        i += 1
    if skipped_kanji:
        warnings.warn(
            "kanji in Japanese input cannot be read without a morphological "
            "dictionary and were skipped; supply kana",
            stacklevel=3,
        )
    romaji = "".join(out)
    return romaji.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")


def symbols_to_japanese(text: str) -> str:
    for regex, replacement in _symbols_to_japanese:
        text = re.sub(regex, replacement, text)
    return text


def japanese_to_romaji_with_accent(text: str) -> str:
    """Kana text -> romaji; accent arrows omitted (no accent dictionary)."""
    from stabletts_tpu.text.english import asciify

    text = symbols_to_japanese(text)
    sentences = re.split(_japanese_marks, text)
    marks = re.findall(_japanese_marks, text)
    out = ""
    for i, sentence in enumerate(sentences):
        if sentence:
            if out:
                out += " "
            out += kana_to_romaji(sentence)
        if i < len(marks):
            out += asciify(marks[i]).replace(" ", "")
    return out


def get_real_sokuon(text: str) -> str:
    for regex, replacement in _real_sokuon:
        text = re.sub(regex, replacement, text)
    return text


def get_real_hatsuon(text: str) -> str:
    for regex, replacement in _real_hatsuon:
        text = re.sub(regex, replacement, text)
    return text


def japanese_to_ipa2(text: str) -> List[str]:
    """(reference: text/japanese.py:138-144)."""
    text = japanese_to_romaji_with_accent(text).replace("...", "…")
    text = get_real_sokuon(text)
    text = get_real_hatsuon(text)
    for regex, replacement in _romaji_to_ipa2:
        text = re.sub(regex, replacement, text)
    return list(text)
