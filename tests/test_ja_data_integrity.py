"""Every reading in the vendored Japanese tables must survive the full
kana -> romaji -> IPA2 pipeline with only symbol-table characters — a bad
kana entry would otherwise be dropped SILENTLY by
cleaned_text_to_sequence (the same guarantee en_lexicon gets from its
validator in the English regression suite)."""

import os
import re

from stabletts_tpu.text.japanese import (
    _romaji_to_ipa2,
    get_real_hatsuon,
    get_real_sokuon,
    kana_to_moras,
)
from stabletts_tpu.text.symbols import symbols

_DATA = os.path.join(
    os.path.dirname(__file__), "..", "stabletts_tpu", "text", "data"
)


def _to_ipa2(kana: str) -> str:
    s = "".join(kana_to_moras(kana))
    s = s.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")
    s = get_real_sokuon(s)
    s = get_real_hatsuon(s)
    for rx, rep in _romaji_to_ipa2:
        s = re.sub(rx, rep, s)
    return s


def _check(path, reading_cols):
    symset = set(symbols)
    bad = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            for c in reading_cols:
                if c < len(parts) and parts[c]:
                    ipa = _to_ipa2(parts[c])
                    missing = [ch for ch in ipa if ch not in symset]
                    if missing:
                        bad.append((ln, parts[0], parts[c], missing))
                    if not ipa:
                        bad.append((ln, parts[0], parts[c], "EMPTY"))
    assert not bad, f"{os.path.basename(path)}: {bad[:10]} (+{len(bad)-10 if len(bad) > 10 else 0} more)"


def test_ja_words_readings_in_symbol_table():
    _check(os.path.join(_DATA, "ja_words.tsv"), [1])


def test_ja_kanji_readings_in_symbol_table():
    # column 2 may carry pipe-separated on variants; column 3 an initial
    # variant — every alternative must individually survive the pipeline
    symset = set(symbols)
    bad = []
    path = os.path.join(_DATA, "ja_kanji.tsv")
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            readings = [parts[1]] if len(parts) > 1 else []
            if len(parts) > 2 and parts[2]:
                readings += parts[2].split("|")
            if len(parts) > 3 and parts[3]:
                readings.append(parts[3])
            for r in readings:
                ipa = _to_ipa2(r)
                missing = [ch for ch in ipa if ch not in symset]
                if missing or not ipa:
                    bad.append((ln, parts[0], r, missing or "EMPTY"))
    assert not bad, bad[:10]


def test_ja_kanji_initial_variant_is_listed():
    """Column 4 (compound-initial on) must be one of column 3's variants —
    an unlisted initial reading would be invisible to audits."""
    path = os.path.join(_DATA, "ja_kanji.tsv")
    bad = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split("\t")
            if len(parts) > 3 and parts[3]:
                ons = parts[2].split("|") if len(parts) > 2 and parts[2] else []
                if parts[3] not in ons:
                    bad.append((ln, parts[0], parts[3], ons))
    assert not bad, bad


def test_ja_bindings_well_formed():
    """ja_bindings.tsv: 2-kanji key, at least one override, every reading
    survives the kana -> IPA2 pipeline with symbol-table characters."""
    symset = set(symbols)
    bad = []
    path = os.path.join(_DATA, "ja_bindings.tsv")
    seen = set()
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split("\t")
            if not parts or not parts[0]:
                continue
            if len(parts) < 3 or len(parts[0]) != 2:
                bad.append((ln, parts[0], "malformed row"))
                continue
            if parts[0] in seen:
                bad.append((ln, parts[0], "duplicate pair"))
            seen.add(parts[0])
            if not parts[1] and not parts[2]:
                bad.append((ln, parts[0], "no override"))
            for r in (parts[1], parts[2]):
                if r:
                    ipa = _to_ipa2(r)
                    missing = [ch for ch in ipa if ch not in symset]
                    if missing or not ipa:
                        bad.append((ln, parts[0], r, missing or "EMPTY"))
    assert not bad, bad[:10]


def test_ja_words_accent_types_sane():
    """Accent type must be an integer within the word's mora count + 1."""
    path = os.path.join(_DATA, "ja_words.tsv")
    bad = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2 or not parts[0]:
                continue
            accent = parts[2] if len(parts) > 2 and parts[2] else "0"
            try:
                a = int(accent)
            except ValueError:
                bad.append((ln, parts[0], accent, "not an int"))
                continue
            n_moras = len(kana_to_moras(parts[1]))
            if not (0 <= a <= n_moras):
                bad.append((ln, parts[0], accent, f"moras={n_moras}"))
    assert not bad, bad[:20]
