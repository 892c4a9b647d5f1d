"""Held-out variant on-reading traps for the kanji fallback (VERDICT r4 #1).

Kanji with multiple common on-readings (力 りょく/りき, 治 じ/ち,
人 じん/にん, 行 こう/ぎょう, 生 せい/しょう, 大 だい/たい, ...) must
resolve correctly through the selection machinery in
stabletts_tpu/text/japanese.py (_select_on_variants: pair bindings from
ja_bindings.tsv + positional initial/final variants from ja_kanji.tsv
column 4) — NOT through ja_words.tsv entries. Every surface below is
asserted absent from ja_words.tsv so the fallback path is exercised.
The reference resolves these through Open JTalk's morphological
dictionary (/root/reference/text/japanese.py:84).
"""

import os
import warnings

import pytest

from stabletts_tpu.text.japanese import (
    japanese_to_romaji_with_accent,
    kana_to_moras,
)

# (surface, expected kana) — readings verified against standard dictionaries
TRAPS = [
    # りき/りょく family: initial りき, effectively-final りょく
    ("量子力学", "りょうしりきがく"),
    ("力学", "りきがく"),
    ("力士", "りきし"),
    ("力作", "りきさく"),
    ("力走", "りきそう"),
    ("力説", "りきせつ"),
    ("力点", "りきてん"),
    ("力量", "りきりょう"),
    ("能力", "のうりょく"),
    ("能力者", "のうりょくしゃ"),
    ("権力", "けんりょく"),
    ("権力者", "けんりょくしゃ"),
    ("努力家", "どりょくか"),
    ("重力", "じゅうりょく"),
    ("実力", "じつりょく"),
    ("全力", "ぜんりょく"),
    ("強力", "きょうりょく"),
    ("威力", "いりょく"),
    # じ/ち family: initial ち, final じ, 自治 binding
    ("自治体", "じちたい"),
    ("地方自治体", "ちほうじちたい"),
    ("自治区", "じちく"),
    ("政治家", "せいじか"),
    ("治安", "ちあん"),
    ("治水", "ちすい"),
    ("治療法", "ちりょうほう"),
    ("退治", "たいじ"),
    ("明治", "めいじ"),
    # にん/じん family: default じん, bindings for にん
    ("社会人", "しゃかいじん"),
    ("現代人", "げんだいじん"),
    ("日本人", "にほんじん"),
    ("米国人", "べいこくじん"),
    ("成人", "せいじん"),
    ("新人", "しんじん"),
    ("人生", "じんせい"),
    ("人類", "じんるい"),
    ("管理人", "かんりにん"),
    ("料理人", "りょうりにん"),
    ("案内人", "あんないにん"),
    ("使用人", "しようにん"),
    ("代理人", "だいりにん"),
    ("犯人", "はんにん"),
    ("病人", "びょうにん"),
    ("商人", "しょうにん"),
    ("芸人", "げいにん"),
    ("住人", "じゅうにん"),
    ("番人", "ばんにん"),
    ("罪人", "ざいにん"),
    ("役人", "やくにん"),
    ("人間性", "にんげんせい"),
    ("人間関係", "にんげんかんけい"),
    # こう/ぎょう family: default こう, bindings for ぎょう
    ("銀行", "ぎんこう"),
    ("飛行", "ひこう"),
    ("行政区", "ぎょうせいく"),
    ("行儀", "ぎょうぎ"),
    ("苦行", "くぎょう"),
    # せい/しょう family
    ("誕生", "たんじょう"),
    ("往生", "おうじょう"),
    ("殺生", "せっしょう"),
    ("畜生", "ちくしょう"),
    ("一生", "いっしょう"),
    ("正面", "しょうめん"),
    ("正体", "しょうたい"),
    ("正式", "せいしき"),
    ("正常", "せいじょう"),
    ("反省", "はんせい"),
    ("帰省", "きせい"),
    ("省庁", "しょうちょう"),
    ("外相", "がいしょう"),
    ("相当", "そうとう"),
    # だい/たい family
    ("大会", "たいかい"),
    ("大量", "たいりょう"),
    ("大戦", "たいせん"),
    ("大気", "たいき"),
    ("大半", "たいはん"),
    ("大差", "たいさ"),
    ("大抵", "たいてい"),
    ("大木", "たいぼく"),
    ("灯台", "とうだい"),
    # ち/じ (地)
    ("地面", "じめん"),
    ("地獄", "じごく"),
    ("地味", "じみ"),
    ("土地", "とち"),
    ("現地", "げんち"),
    ("各地", "かくち"),
    # せい/せ (世)
    ("世界観", "せかいかん"),
    ("世間", "せけん"),
    ("世話", "せわ"),
    ("出世", "しゅっせ"),
    ("世論", "せろん"),
    # らく/がく (楽)
    ("音楽界", "おんがくかい"),
    ("楽曲", "がっきょく"),
    ("極楽", "ごくらく"),
    # ごう/がっ (合)
    ("合併", "がっぺい"),
    ("合宿", "がっしゅく"),
    ("合唱団", "がっしょうだん"),
    ("合戦", "かっせん"),
    ("合致", "がっち"),
    ("合体", "がったい"),
    ("連合", "れんごう"),
    ("総合", "そうごう"),
    ("集合", "しゅうごう"),
    # さく/さ (作)
    ("作業員", "さぎょういん"),
    ("作用", "さよう"),
    ("作法", "さほう"),
    ("副作用", "ふくさよう"),
    ("動作", "どうさ"),
    # きょう/ごう (強)
    ("強引", "ごういん"),
    ("強盗", "ごうとう"),
    ("強情", "ごうじょう"),
    ("強化", "きょうか"),
    ("勉強家", "べんきょうか"),
    # ぜん/ねん (然)
    ("天然", "てんねん"),
    ("当然", "とうぜん"),
    # にち/じつ (日)
    ("当日", "とうじつ"),
    ("本日", "ほんじつ"),
    ("先日", "せんじつ"),
    ("期日", "きじつ"),
    ("終日", "しゅうじつ"),
    ("後日", "ごじつ"),
    ("元日", "がんじつ"),
    # ご/こう (後)
    ("後者", "こうしゃ"),
    ("後輩", "こうはい"),
    # ゆう/ゆ (由)
    ("経由", "けいゆ"),
    ("由来", "ゆらい"),
    # げん/がん (元)
    ("元来", "がんらい"),
    ("元祖", "がんそ"),
    # ぶつ/もつ (物)
    ("禁物", "きんもつ"),
    ("食物", "しょくもつ"),
    # ぶん/もん (文)
    ("文句", "もんく"),
    ("文部", "もんぶ"),
    # とう/ず (頭)
    ("頭脳", "ずのう"),
    ("先頭", "せんとう"),
    ("店頭", "てんとう"),
    # misc lexicalized bindings
    ("通夜", "つや"),
    ("一対", "いっつい"),
    ("一切", "いっさい"),
    ("引率", "いんそつ"),
    ("建立", "こんりゅう"),
    ("留守", "るす"),
    ("和尚", "おしょう"),
    ("細工", "さいく"),
    ("神宮", "じんぐう"),
    ("黄金", "おうごん"),
    ("無言", "むごん"),
    ("支度", "したく"),
    ("納得", "なっとく"),
    ("収納", "しゅうのう"),
    ("次第", "しだい"),
    ("質屋", "しちや"),
    ("坊主", "ぼうず"),
    ("発作", "ほっさ"),
    ("発足", "ほっそく"),
    ("平等", "びょうどう"),
    ("句読点", "くとうてん"),
    ("有無", "うむ"),
    ("所有", "しょゆう"),
    ("面目", "めんぼく"),
    ("土木", "どぼく"),
]

_WORDS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "stabletts_tpu", "text", "data",
    "ja_words.tsv",
)


def _word_surfaces():
    with open(_WORDS_PATH, encoding="utf-8") as f:
        return {line.split("\t")[0] for line in f}


def _expected_romaji(kana: str) -> str:
    s = "".join(kana_to_moras(kana))
    return s.replace("ch", "ʧ").replace("sh", "ʃ").replace("cl", "Q")


def _strip_accent(s: str) -> str:
    return s.replace("↑", "").replace("↓", "")


def test_traps_held_out_of_word_table():
    surfaces = _word_surfaces()
    leaked = [s for s, _ in TRAPS if s in surfaces]
    assert not leaked, (
        f"variant-reading traps must stay OUT of ja_words.tsv so the "
        f"selection machinery is exercised; found in table: {leaked}"
    )
    assert len(TRAPS) >= 100


@pytest.mark.parametrize("surface,kana", TRAPS, ids=[s for s, _ in TRAPS])
def test_variant_reading(surface, kana):
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unknown-kanji skips allowed
        got = japanese_to_romaji_with_accent(surface)
    exp = _expected_romaji(kana)
    assert _strip_accent(got).replace(" ", "").lower() == exp.lower(), (
        f"{surface}: read {_strip_accent(got)!r}, expected {exp!r}"
    )
