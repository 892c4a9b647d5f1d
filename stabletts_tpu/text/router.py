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

    phones: List[str] = []
    pos = 0
    for m in _SPAN.finditer(text):
        # leading non-language chars (punctuation): route via chinese
        # normalization (handles CJK punctuation), dropping whitespace
        gap = text[pos : m.start()]
        if gap.strip():
            phones.extend(chinese_to_cnm3(gap))
        lang = m.lastgroup
        span = m.group()
        if lang == "zh":
            phones.extend(chinese_to_cnm3(span))
        elif lang == "ja":
            phones.extend(japanese_to_ipa2(span))
        else:
            phones.extend(english_to_ipa2(span))
        pos = m.end()
    tail = text[pos:]
    if tail.strip():
        phones.extend(chinese_to_cnm3(tail))
    return phones
