"""Inflection-closure generator for en_lexicon (VERDICT r4 #3).

Derives inflected lexicon rows from base lemmas and writes them to
text/data/en_lexicon_inflect.tsv (machine-generated, regenerate freely;
the loader in stabletts_tpu/text/english.py reads it after the hand-kept
en_lexicon.tsv, which always wins on conflict).

Sources of POS evidence (precision over recall — only forms attested by
an annotation or an unambiguous noun suffix are generated):
  * text/data/en_verbs.txt  — authored verb lemmas -> -s/-ed/-ing
    (irregular verbs generate -s/-ing only; their pasts are lexical)
  * text/data/en_nouns.txt  — authored noun lemmas -> plural -s
  * noun-suffix rule: lemmas ending -tion/-ment/-ness/-ity/... -> -s

Pronunciations are derived with the SAME voicing-assimilation rules the
runtime morphology applies (english.py _suffix_s/_suffix_ed), so a
generated row and the runtime derivation are always identical — the rows
make the lookup direct instead of recursive. The reference inherits all
inflected forms from CMUdict (/root/reference/text/english.py:169-175).

Usage: python tools/en_inflect.py [--check]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stabletts_tpu.text.english import (  # noqa: E402
    _insert_stress,
    _split_phones,
    _suffix_ed,
    _suffix_s,
)

_DATA = os.path.join(
    os.path.dirname(__file__), "..", "stabletts_tpu", "text", "data"
)
LEXICON = os.path.join(_DATA, "en_lexicon.tsv")
OUT = os.path.join(_DATA, "en_lexicon_inflect.tsv")
VERBS = os.path.join(_DATA, "en_verbs.txt")
NOUNS = os.path.join(_DATA, "en_nouns.txt")
VERBS2 = os.path.join(_DATA, "en_verbs2.txt")
NOUNS2 = os.path.join(_DATA, "en_nouns2.txt")

# -er/-ant/-ary/-ery deliberately absent: they catch adjectives (meager,
# scant, sedimentary, very) whose "plurals" are junk
NOUN_SUFFIXES = (
    "tion", "sion", "ment", "ness", "ity", "ance", "ence", "ship", "ism",
    "age", "ist", "hood", "dom", "logy", "graphy", "or", "ure",
)

# irregular verbs: -ed must not be generated (their pasts are lexicon rows)
IRREGULAR = set("""
be am is are was were been have has had do does did go goes went gone make
made take took taken come came see saw seen know knew known get got gotten
give gave given find found think thought tell told become became leave left
put mean meant keep kept let begin began begun show shown hear heard run ran
bring brought write wrote written sit sat stand stood lose lost pay paid
meet met lead led understand understood speak spoke spoken spend spent grow
grew grown win  buy bought send sent build built fall fell fallen cut
sell sold rise rose risen drive drove driven break broke broken wear wore
worn choose chose chosen deal dealt eat ate eaten teach taught catch caught
draw drew drawn throw threw thrown fly flew flown swim swam swum ride rode
ridden sing sang sung fight fought hold held hide hid hidden shake shook
shaken blow blew blown freeze froze frozen steal stole stolen bite bit
bitten beat beaten bend bent burn burnt dig dug feed fed hang hung lay laid
lie lied ring rang rung seek sought shine shone shoot shot shut slide slid
spread spring sprang sprung stick stuck strike struck swear swore sworn
sweep swept tear tore torn wind wound forget forgot forgotten sleep slept
wake woke woken dream bear bore borne bleed bled breed bred cling clung
creep crept flee fled fling flung forbid forbade forbidden forgive forgave
forgiven kneel knelt lend lent light lit quit read say said sew sewn shed
slay slew slain sling slung sow sown spin spun spit spat split string strung
strive strove swing swung weave wove woven weep wept cost hit hurt set cast
burst thrust spill spilt smell leap leapt learn lean mow mown prove shrink
shrank shrunk sink sank sunk stink stank stunk wring wrung drink drank
drunk undergo underwent undergone undertake undertook undertaken overcome
overcame oversee oversaw overseen withdraw withdrew withdrawn withstand
withstood misunderstand misunderstood rebuild rebuilt repay repaid
broadcast forecast bet bid bind bound grind ground
""".split())

_VOWELS = "aeiou"


def spell_s(w: str) -> str:
    if w.endswith(("s", "x", "z", "ch", "sh")):
        return w + "es"
    if w.endswith("y") and len(w) > 1 and w[-2] not in _VOWELS:
        return w[:-1] + "ies"
    if w.endswith("o") and len(w) > 1 and w[-2] not in _VOWELS:
        return w + "es"  # potatoes, heroes
    return w + "s"


def _final_stress(pron: str) -> bool:
    """True when the pron's primary stress falls on the last syllable
    (admit -> admitted doubles; visit -> visited does not)."""
    i = pron.rfind("ˈ")
    if i < 0:
        return True  # monosyllable
    tail = pron[i:]
    n = 0
    j = 0
    while j < len(tail):
        if tail[j : j + 2] in ("aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ", "ər"):
            n += 1
            j += 2
        elif tail[j] in "æɑɔəɛɪʊiu":
            n += 1
            j += 1
        else:
            j += 1
    return n <= 1


def _doubles(w: str, pron: str) -> bool:
    return (
        len(w) >= 3
        and w[-1] not in _VOWELS + "wxy"
        and w[-1].isalpha()
        and w[-2] in _VOWELS
        and (len(w) > 2 and w[-3] not in _VOWELS)
        and _final_stress(pron)
    )


def spell_ed(w: str, pron: str) -> str:
    if w.endswith("e"):
        return w + "d"
    if w.endswith("y") and len(w) > 1 and w[-2] not in _VOWELS:
        return w[:-1] + "ied"
    if _doubles(w, pron):
        return w + w[-1] + "ed"
    return w + "ed"


def spell_ing(w: str, pron: str) -> str:
    if w.endswith("ie"):
        return w[:-2] + "ying"  # tie -> tying
    if w.endswith("e") and not w.endswith(("ee", "oe", "ye")):
        return w[:-1] + "ing"
    if _doubles(w, pron):
        return w + w[-1] + "ing"
    return w + "ing"


def load_lexicon():
    lex = {}
    for line in open(LEXICON, encoding="utf-8"):
        if "\t" in line:
            w, p = line.rstrip("\n").split("\t", 1)
            lex.setdefault(w, p)
    return lex


def load_list(path):
    words = []
    if os.path.exists(path):
        for line in open(path, encoding="utf-8"):
            if line.lstrip().startswith("#"):
                continue
            words += line.split()
    return [w.lower() for w in words if w]


def generate():
    lex = load_lexicon()
    out = {}
    absent = []

    def emit(spelling, pron):
        if spelling in lex:
            return
        # an unmarked monosyllable base can derive a polysyllable (ache ->
        # aching): eng_to_ipa always stresses polysyllables, so mark the
        # base syllable (same rule the runtime applies in ipa_convert)
        if "ˈ" not in pron and "ˌ" not in pron:
            phones = _split_phones(pron)
            if sum(1 for _, v in phones if v) >= 2:
                pron = "".join(p for p, _ in _insert_stress(phones, 0, "ˈ"))
        out.setdefault(spelling, pron)

    for v in load_list(VERBS) + load_list(VERBS2):
        p = lex.get(v)
        if p is None:
            absent.append(v)
            continue
        emit(spell_s(v), _suffix_s(p))
        emit(spell_ing(v, p), p + "ɪŋ")
        if v not in IRREGULAR:
            emit(spell_ed(v, p), _suffix_ed(p))
    for n in load_list(NOUNS) + load_list(NOUNS2):
        p = lex.get(n)
        if p is None:
            absent.append(n)
            continue
        if not n.endswith("s"):
            emit(spell_s(n), _suffix_s(p))
    # unambiguous noun suffixes -> plural
    for w, p in lex.items():
        if "'" in w or w.endswith("s") or len(w) < 4:
            continue
        if w.endswith(NOUN_SUFFIXES) and not w.endswith(("eous", "ious")):
            emit(spell_s(w), _suffix_s(p))
    return out, absent


def main():
    out, absent = generate()
    rows = sorted(out.items())
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# machine-generated by tools/en_inflect.py — do not edit\n")
        for w, p in rows:
            f.write(f"{w}\t{p}\n")
    print(f"wrote {len(rows)} generated rows to {os.path.relpath(OUT)}")
    if absent:
        print(f"{len(absent)} annotated lemmas absent from lexicon:")
        print(" ", " ".join(sorted(set(absent))[:50]))


if __name__ == "__main__":
    main()
