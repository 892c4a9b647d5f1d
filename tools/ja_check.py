"""Validator for text/data/ja_words.tsv and ja_kanji.tsv.

Checks: readings are kana-only (hiragana/katakana/ー), accent type is an
integer within [0, mora_count], duplicate surfaces are reported and
optionally dropped (first entry wins, matching the loader's setdefault).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def _is_kana(ch: str) -> bool:
    o = ord(ch)
    return 0x3041 <= o <= 0x309F or 0x30A1 <= o <= 0x30FF or ch == "ー"


def _mora_count(reading: str) -> int:
    small = set("ゃゅょャュョぁぃぅぇぉァィゥェォ")
    return sum(1 for c in reading if c not in small)


def check(words_path: str, kanji_path: str, fix_dups: bool = False) -> int:
    errors = []
    for path, has_accent in ((words_path, True), (kanji_path, False)):
        seen = {}
        lines = []
        dup_idx = set()
        with open(path, encoding="utf-8") as f:
            for lineno, raw in enumerate(f, 1):
                line = raw.rstrip("\n")
                lines.append(line)
                if not line:
                    continue
                parts = line.split("\t")
                if len(parts) < 2 or not parts[0]:
                    errors.append(f"{path}:{lineno}: malformed {line!r}")
                    continue
                surface, reading = parts[0], parts[1]
                if surface in seen:
                    dup_idx.add(lineno - 1)
                    if seen[surface] != reading:
                        errors.append(
                            f"{path}:{lineno}: dup {surface!r} reading "
                            f"{reading!r} != first {seen[surface]!r}"
                        )
                    continue
                seen[surface] = reading
                bad = [c for c in reading if not _is_kana(c)]
                if bad:
                    errors.append(f"{path}:{lineno}: {surface}: non-kana {bad!r}")
                if has_accent and len(parts) > 2 and parts[2]:
                    try:
                        acc = int(parts[2])
                    except ValueError:
                        errors.append(f"{path}:{lineno}: {surface}: bad accent {parts[2]!r}")
                        continue
                    moras = _mora_count(reading)
                    if not 0 <= acc <= moras:
                        errors.append(
                            f"{path}:{lineno}: {surface}: accent {acc} > {moras} moras"
                        )
        n = len(seen)
        print(f"{path}: {n} unique entries, {len(dup_idx)} duplicate lines")
        if fix_dups and dup_idx and not errors:
            kept = [l for i, l in enumerate(lines) if i not in dup_idx]
            with open(path, "w", encoding="utf-8") as f:
                f.write("\n".join(kept) + "\n")
            print(f"  removed {len(dup_idx)} duplicates (first wins)")
    for e in errors[:40]:
        print("  " + e)
    if len(errors) > 40:
        print(f"  ... and {len(errors) - 40} more")
    return 1 if errors else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", default="stabletts_tpu/text/data/ja_words.tsv")
    ap.add_argument("--kanji", default="stabletts_tpu/text/data/ja_kanji.tsv")
    ap.add_argument("--fix-dups", action="store_true")
    args = ap.parse_args()
    sys.exit(check(args.words, args.kanji, args.fix_dups))
