"""Automatic language routing for mixed-language text.

The reference ships a `cjke_cleaners4` auto-router that is dead code and
buggy (concatenates a list onto a str, text/cleaners.py:30-58); this is a
working equivalent: the text is split into language spans (Chinese han /
Japanese kana / everything-latin) and each span is dispatched to its g2p,
with punctuation attached to the preceding span.
"""

from __future__ import annotations

import re
from typing import List

_HAN = r"一-鿿㐀-䶿"
_KANA = r"ぁ-ヿ"
_SPAN = re.compile(
    rf"(?P<ja>[{_KANA}]+[{_HAN}{_KANA}]*)|(?P<zh>[{_HAN}]+)|(?P<en>[A-Za-z][A-Za-z' ]*)"
)


def detect_language(text: str) -> str:
    """Dominant language of a string: 'chinese' | 'japanese' | 'english'."""
    counts = {"zh": 0, "ja": 0, "en": 0}
    for m in _SPAN.finditer(text):
        counts[m.lastgroup] += len(m.group())
    if counts["ja"]:
        return "japanese"
    if counts["zh"] >= counts["en"]:
        return "chinese" if counts["zh"] else "english"
    return "english"


def auto_g2p(text: str) -> List[str]:
    """Mixed text -> phone list, routing each span to its language g2p.

    Spans containing kana are treated as Japanese (kanji inside them still
    needs kana-ization); pure-han spans go to the Chinese g2p; latin spans to
    English. Punctuation between spans passes through the following span's
    cleaner (or as raw symbols).
    """
    from stabletts_tpu.text.english import english_to_ipa2
    from stabletts_tpu.text.japanese import japanese_to_ipa2
    from stabletts_tpu.text.mandarin import chinese_to_cnm3

    g2p = {
        "zh": chinese_to_cnm3,
        "ja": japanese_to_ipa2,
        "en": english_to_ipa2,
    }
    matches = list(_SPAN.finditer(text))

    def route_gap(gap: str, prev_lang, next_lang):
        if not gap.strip():
            return
        # digits belong to the surrounding language — a '5' inside an English
        # sentence must be verbalized in English, not read as Mandarin 'wu3'.
        # The japanese g2p has no number verbalizer, so digit spans adjacent
        # to kana route through chinese (kanji-numeral reading convention).
        if re.search(r"[0-9]", gap):
            lang = prev_lang or next_lang or "en"
            if lang == "ja":
                lang = "zh"
            phones.extend(g2p[lang](gap))
        else:
            # bare punctuation: chinese normalization handles both CJK and
            # ascii punctuation tables
            phones.extend(chinese_to_cnm3(gap))

    phones: List[str] = []
    pos = 0
    for i, m in enumerate(matches):
        prev_lang = matches[i - 1].lastgroup if i else None
        route_gap(text[pos : m.start()], prev_lang, m.lastgroup)
        phones.extend(g2p[m.lastgroup](m.group()))
        pos = m.end()
    route_gap(text[pos:], matches[-1].lastgroup if matches else None, None)
    return phones
