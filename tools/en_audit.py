"""English lexicon integrity audit (VERDICT r4 #2).

Two invariants:
  1. frequency-mass coverage — every word in text/data/en_top5k.txt must
     resolve through the lexicon + morphology (stabletts_tpu.text.english
     ._lookup), never the letter-to-sound fallback. The reference inherits
     all of CMUdict via eng_to_ipa (/root/reference/text/english.py:169-175),
     so top-frequency words are always lexical there.
  2. lemma closure — for every lexicon entry that looks like a regular
     inflection (-s/-ed/-ing/-ly/-er/-est), some candidate lemma must also
     resolve; "covered"-without-"cover" holes hide exactly here. Entries
     that are not true inflections (naked, hundred, thing ...) live in the
     allowlist in tests/test_english_lexicon_integrity.py.

Usage: python tools/en_audit.py [--top5k] [--closure]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stabletts_tpu.text.english import _load_lexicon, _lookup  # noqa: E402

_DATA = os.path.join(
    os.path.dirname(__file__), "..", "stabletts_tpu", "text", "data"
)
TOP5K_PATH = os.path.join(_DATA, "en_top5k.txt")


def top5k_words():
    with open(TOP5K_PATH, encoding="utf-8") as f:
        return [w.strip().lower() for w in f if w.strip()]


def top5k_misses():
    """Top-5k words that fall through to letter-to-sound."""
    return [w for w in top5k_words() if _lookup(w) is None]


def _lemma_candidates(word: str):
    """Candidate lemmas for a spelled inflection, mirroring the runtime
    morphology's stripping rules (english.py _lookup)."""
    cands = []
    if word.endswith("ies") and len(word) > 4:
        cands.append(word[:-3] + "y")
    if word.endswith("es"):
        cands += [word[:-2], word[:-1]]
    if word.endswith("s") and not word.endswith("ss"):
        cands.append(word[:-1])
    if word.endswith("ied") and len(word) > 4:
        cands.append(word[:-3] + "y")
    if word.endswith("ed") and not word.endswith("eed"):
        stem = word[:-2]
        if len(stem) >= 3:
            cands += [stem, stem + "e"]
            if stem[-1] == stem[-2]:
                cands.append(stem[:-1])
    if word.endswith("ying"):
        cands.append(word[:-4] + "ie")
    if word.endswith("ing"):
        stem = word[:-3]
        if len(stem) >= 3:
            cands += [stem, stem + "e"]
            if stem[-1] == stem[-2]:
                cands.append(stem[:-1])
    return [c for c in cands if len(c) >= 3]


# High-precision inflection shapes only: -ed/-ing/-(e)s. Agentive -er,
# adverbial -ly, superlative -est are derivational — a missing base there
# is not a "covered"-without-"cover" hole — and Latin/Greek -us/-is/-os/
# -as/-ous finals are not plurals.
INFLECTION_SUFFIXES = ("ies", "es", "s", "ied", "ed", "ing")
_NON_PLURAL_ENDINGS = ("ss", "us", "is", "os", "as", "ous", "ics")


def closure_violations():
    """Lexicon entries shaped like inflections whose every candidate lemma
    fails to resolve. Legitimately non-inflectional words (always, during,
    hundred, naked ...) are expected — the caller filters an allowlist."""
    lex = _load_lexicon()
    out = []
    for word in lex:
        if "'" in word:  # contractions / possessives are not inflections
            continue
        if not any(word.endswith(s) for s in INFLECTION_SUFFIXES):
            continue
        if word.endswith("s") and (
            len(word) < 4 or word.endswith(_NON_PLURAL_ENDINGS)
        ):
            continue
        cands = _lemma_candidates(word)
        if not cands:
            continue
        if not any(_lookup(c) is not None for c in cands):
            out.append(word)
    return sorted(out)


def main():
    args = sys.argv[1:]
    if not args or "--top5k" in args:
        misses = top5k_misses()
        print(f"top5k: {len(top5k_words())} words, {len(misses)} LTS fallbacks")
        for w in misses:
            print(" ", w)
    if not args or "--closure" in args:
        v = closure_violations()
        print(f"closure: {len(v)} inflection-shaped entries without a lemma")
        for w in v:
            print(" ", w)


if __name__ == "__main__":
    main()
