"""Build the text-frontend data tables from the reference's vendored dictionary
data (run once; outputs are committed).

Sources (PUBLIC DATA, read-only):
  * /root/reference/text/custom_pypinyin_dict/cc_cedict_{0..3}.py + genshin.py
    — CC-CEDICT-derived phrase->pinyin data (CC BY-SA 4.0) + genshin names
  * /root/reference/text/cnm3/ds_CNM3.txt — pinyin-syllable -> CNM3 phones

Outputs (stabletts_tpu/text/data/):
  * pinyin_phrases.tsv — phrase \t TONE3 syllables (space-separated)
  * pinyin_chars.tsv   — single char \t TONE3 syllable (majority vote over
    all phrase occurrences; replaces pypinyin's built-in single-char dict)
  * cnm3.tsv           — syllable \t phones
"""

import ast
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stabletts_tpu.text.pinyin import diacritic_to_tone3

REF = "/root/reference/text"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "stabletts_tpu", "text", "data")


def load_phrase_dicts():
    total = {}
    for name in ["cc_cedict_0", "cc_cedict_1", "cc_cedict_2", "cc_cedict_3", "genshin"]:
        src = open(f"{REF}/custom_pypinyin_dict/{name}.py", encoding="utf-8").read()
        m = re.search(r"phrases_dict = (\{.*?\n\})", src, re.S)
        total.update(ast.literal_eval(m.group(1)))
    return total


# The phrase-majority vote biases a polyphone's default toward its
# bound-morpheme reading (都 -> du1 because 首都/都市-class phrases dominate
# the dictionary), but a char left STANDALONE by jieba is usually the free
# word — adverb/verb — whose reading pypinyin's own single-char dict lists
# first and the reference therefore produces. Curated overrides for the
# common cases (pypinyin pinyin_dict first readings).
STANDALONE_OVERRIDES = {
    "都": "dou1",  # adverb "all" (du1 stays via 首都/都市 phrases)
    "还": "hai2",  # adverb "still" (huan2 via 还钱/归还 phrases)
    "曾": "ceng2",  # adverb "once" (zeng1 via 曾孙/曾祖 phrases)
    "藏": "cang2",  # verb "hide" (zang4 via 西藏/宝藏 phrases)
    "更": "geng4",  # adverb "more" (geng1 via 更新/三更 phrases)
    "将": "jiang1",  # preposition (jiang4 via 大将/将领 phrases)
    "应": "ying1",  # 应该-class (ying4 via 反应/应用 phrases)
    "切": "qie1",  # verb "cut" (qie4 via 一切/亲切 phrases)
    "只": "zhi3",  # adverb "only" (zhi1 via 一只/船只 phrases)
}


def main():
    os.makedirs(OUT, exist_ok=True)
    phrases = load_phrase_dicts()
    print(f"loaded {len(phrases)} phrases")

    char_votes = collections.defaultdict(collections.Counter)
    n_bad = 0
    with open(f"{OUT}/pinyin_phrases.tsv", "w", encoding="utf-8") as f:
        for phrase, per_char in sorted(phrases.items()):
            if len(phrase) != len(per_char):
                n_bad += 1
                continue
            try:
                syls = [diacritic_to_tone3(alts[0]) for alts in per_char]
            except Exception:
                n_bad += 1
                continue
            f.write(phrase + "\t" + " ".join(syls) + "\n")
            for ch, syl in zip(phrase, syls):
                char_votes[ch][syl] += 1
    print(f"wrote phrases ({n_bad} skipped)")

    with open(f"{OUT}/pinyin_chars.tsv", "w", encoding="utf-8") as f:
        for ch in sorted(char_votes):
            syl, _ = char_votes[ch].most_common(1)[0]
            syl = STANDALONE_OVERRIDES.get(ch, syl)
            f.write(ch + "\t" + syl + "\n")
    print(f"wrote {len(char_votes)} single-char readings")

    with open(f"{REF}/cnm3/ds_CNM3.txt", encoding="utf-8") as fin, open(
        f"{OUT}/cnm3.tsv", "w", encoding="utf-8"
    ) as fout:
        n = 0
        for line in fin:
            line = line.strip()
            if not line:
                continue
            syllable, phones = line.split(",", 1)
            fout.write(syllable + "\t" + phones + "\n")
            n += 1
    print(f"wrote {n} cnm3 syllables")


if __name__ == "__main__":
    main()
