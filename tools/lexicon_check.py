"""Validator for text/data/en_lexicon.tsv entries.

Checks every entry against the eng_to_ipa output conventions this repo's
g2p relies on (text/english.py):
  * charset: only IPA chars that survive the ipa->ipa2 substitutions into
    the 401-symbol table (ə-based vowel set — never ʌ/ɜ; r not ɹ; ʧ/ʤ
    single chars; stress marks ˈ/ˌ)
  * structure: no spaces, stress marks must precede a phoneme, polysyllabic
    entries should carry a primary stress, monosyllables must not
  * duplicates: repeated words (first entry wins at load; duplicates are
    dead weight) are reported

Usage: python tools/lexicon_check.py [--fix-dups] [path]
"""

from __future__ import annotations

import argparse
import sys

VOWELS = ["aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ", "æ", "ɑ", "ɔ", "ə", "ɛ", "ɪ", "ʊ", "i", "u"]
CONSONANTS = ["b", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "r", "s",
              "t", "v", "w", "z", "ð", "ŋ", "ʃ", "ʒ", "θ", "ʤ", "ʧ"]
STRESS = ["ˈ", "ˌ"]
ALLOWED = set("".join(VOWELS + CONSONANTS + STRESS))
BANNED = set("ʌɜːɹcqxy ʔɒɐɨʉɯɤøɶœɞɘɵɥɫ'-.")


def count_syllables(pron: str) -> int:
    i, n = 0, 0
    while i < len(pron):
        if pron[i : i + 2] in ("aɪ", "aʊ", "eɪ", "oʊ", "ɔɪ"):
            n += 1
            i += 2
        elif pron[i] in "æɑɔəɛɪʊiu":
            n += 1
            i += 1
        else:
            i += 1
    return n


def check(path: str, fix_dups: bool = False, drop_conflicts: bool = False) -> int:
    errors = []
    conflicts = []
    seen: dict = {}
    lines = []
    dup_lines = set()
    with open(path, encoding="utf-8") as f:
        for lineno, raw in enumerate(f, 1):
            line = raw.rstrip("\n")
            lines.append(line)
            if not line:
                continue
            if "\t" not in line:
                errors.append(f"{lineno}: no tab: {line!r}")
                continue
            word, pron = line.split("\t", 1)
            if "\t" in pron:
                errors.append(f"{lineno}: extra tab: {line!r}")
                pron = pron.split("\t")[0]
            if word != word.lower() or not word:
                errors.append(f"{lineno}: word not lowercase: {word!r}")
            if word in seen:
                dup_lines.add(lineno - 1)
                if seen[word] != pron:
                    conflicts.append(
                        f"{lineno}: dup {word!r} with DIFFERENT pron "
                        f"{pron!r} vs line {seen[word + chr(0)]}: {seen[word]!r}"
                    )
                continue
            seen[word] = pron
            seen[word + chr(0)] = lineno
            bad = [c for c in pron if c not in ALLOWED]
            if bad:
                errors.append(f"{lineno}: {word}: bad chars {bad!r} in {pron!r}")
                continue
            syl = count_syllables(pron)
            vowel_chars = sum(1 for c in pron if c in "æɑɔəɛɪʊiuae o")
            if syl == 0:
                errors.append(f"{lineno}: {word}: no vowel in {pron!r}")
            has_primary = "ˈ" in pron
            # vowel_chars (not syl) for the monosyllable check: 'ˈdrɔɪŋ'
            # (draw-ing, CMU AO1 IH0) is 2 syllables but the ɔɪ spelling
            # collides with the diphthong. Multiple ˈ is legitimate: CMU
            # has double primaries (thirteen TH ER1 T IY1 N).
            if vowel_chars <= 1 and ("ˈ" in pron or "ˌ" in pron):
                errors.append(f"{lineno}: {word}: stress on monosyllable {pron!r}")
            if syl >= 2 and not has_primary:
                errors.append(f"{lineno}: {word}: {syl}-syllable, no ˈ: {pron!r}")
            if pron and pron[-1] in STRESS:
                errors.append(f"{lineno}: {word}: trailing stress mark {pron!r}")

    n_words = sum(1 for k in seen if not k.endswith(chr(0)))
    print(f"{path}: {n_words} unique words, {len(dup_lines)} duplicate lines "
          f"({len(conflicts)} conflicting), {len(errors)} errors")
    shown = errors + ([] if drop_conflicts else conflicts)
    for e in shown[:60]:
        print("  " + e)
    if len(shown) > 60:
        print(f"  ... and {len(shown) - 60} more")

    blocking = errors if drop_conflicts else errors + conflicts
    if fix_dups and dup_lines and not blocking:
        kept = [l for i, l in enumerate(lines) if i not in dup_lines]
        with open(path, "w", encoding="utf-8") as f:
            f.write("\n".join(kept) + "\n")
        print(f"removed {len(dup_lines)} duplicate lines (first entry wins)")
    return 1 if blocking else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("path", nargs="?",
                    default="stabletts_tpu/text/data/en_lexicon.tsv")
    ap.add_argument("--fix-dups", action="store_true")
    ap.add_argument("--drop-conflicts", action="store_true",
                    help="with --fix-dups: also drop later conflicting dups "
                         "(first entry wins) instead of treating them as errors")
    args = ap.parse_args()
    sys.exit(check(args.path, args.fix_dups, args.drop_conflicts))
