"""Held-out Sino-Japanese compound regression for the kanji fallback.

Every surface form below is asserted ABSENT from ja_words.tsv, so the
reading must come from the per-kanji on/kun fallback path in
stabletts_tpu/text/japanese.py (_segment + _join_on_readings +
_compound_accent) — the reference gets these from Open JTalk's
morphological dictionary (/root/reference/text/japanese.py:84).

Covers: on-reading selection for multi-kanji compounds, sokuon
gemination (つ/ち/く/き + k/s/t/h), h->p hardening after っ/ん, the
isolated-kanji kun path, suffix attachment after all-kanji words, and
the compound accent rule (single accent phrase, nucleus placement).
"""

import os
import warnings

import pytest

from stabletts_tpu.text.japanese import (
    japanese_to_romaji_with_accent,
    kana_to_moras,
)

# (surface, expected kana reading) — readings verified against standard
# dictionaries; all surfaces held OUT of ja_words.tsv (asserted below)
COMPOUNDS = [
    # VERDICT round-3 probe set
    ("半導体", "はんどうたい"),
    ("顕微鏡", "けんびきょう"),
    ("徹夜", "てつや"),
    ("競争力", "きょうそうりょく"),
    # gemination: つ/ち + k/s/t/p
    ("発表", "はっぴょう"),
    ("一致", "いっち"),
    ("出張", "しゅっちょう"),
    ("決定", "けってい"),
    ("達成", "たっせい"),
    ("作曲", "さっきょく"),
    ("特急", "とっきゅう"),
    ("圧縮", "あっしゅく"),
    ("沸騰", "ふっとう"),
    ("結晶", "けっしょう"),
    ("実証", "じっしょう"),
    ("摘発", "てきはつ"),
    # gemination: く/き + k
    ("学会", "がっかい"),
    ("国会", "こっかい"),
    ("石灰", "せっかい"),
    ("国境", "こっきょう"),
    ("関係各国", "かんけいかっこく"),
    # h -> p after っ and ん
    ("文法", "ぶんぽう"),
    ("憲法", "けんぽう"),
    ("先輩", "せんぱい"),
    ("乾杯", "かんぱい"),
    ("立法", "りっぽう"),
    # plain on-on compounds
    ("電子", "でんし"),
    ("建設", "けんせつ"),
    ("設計", "せっけい"),
    ("開発", "かいはつ"),
    ("消防", "しょうぼう"),
    ("観測", "かんそく"),
    ("測定", "そくてい"),
    ("計測", "けいそく"),
    ("推定", "すいてい"),
    ("仮説", "かせつ"),
    ("検証", "けんしょう"),
    ("論証", "ろんしょう"),
    ("電圧", "でんあつ"),
    ("電流", "でんりゅう"),
    ("抵抗", "ていこう"),
    ("回路", "かいろ"),
    ("配線", "はいせん"),
    ("衛星", "えいせい"),
    ("軌道", "きどう"),
    ("天体", "てんたい"),
    ("惑星", "わくせい"),
    ("重力", "じゅうりょく"),
    ("磁力", "じりょく"),
    ("浮力", "ふりょく"),
    ("膨張", "ぼうちょう"),
    ("凝固", "ぎょうこ"),
    ("蒸発", "じょうはつ"),
    ("融解", "ゆうかい"),
    ("分子", "ぶんし"),
    ("酸化", "さんか"),
    ("還元", "かんげん"),
    ("触媒", "しょくばい"),
    ("溶液", "ようえき"),
    ("濃度", "のうど"),
    ("沈殿", "ちんでん"),
    ("蒸留", "じょうりゅう"),
    ("抽出", "ちゅうしゅつ"),
    ("精製", "せいせい"),
    ("合成", "ごうせい"),
    ("繊維", "せんい"),
    ("樹脂", "じゅし"),
    ("陶器", "とうき"),
    ("鋳造", "ちゅうぞう"),
    ("溶接", "ようせつ"),
    ("研磨", "けんま"),
    ("切削", "せっさく"),
    ("出荷", "しゅっか"),
    ("在庫", "ざいこ"),
    ("物流", "ぶつりゅう"),
    ("納期", "のうき"),
    ("発注", "はっちゅう"),
    ("受注", "じゅちゅう"),
    ("決算", "けっさん"),
    ("融資", "ゆうし"),
    ("株式", "かぶしき"),
    ("債券", "さいけん"),
    ("財政", "ざいせい"),
    ("税制", "ぜいせい"),
    ("関税", "かんぜい"),
    ("輸出", "ゆしゅつ"),
    ("輸入", "ゆにゅう"),
    ("条約", "じょうやく"),
    ("協定", "きょうてい"),
    ("決議", "けつぎ"),
    ("憲章", "けんしょう"),
    ("司法", "しほう"),
    ("裁判官", "さいばんかん"),
    ("弁護", "べんご"),
    ("検察", "けんさつ"),
    ("逮捕", "たいほ"),
    ("捜査", "そうさ"),
    ("判決", "はんけつ"),
    ("刑罰", "けいばつ"),
    ("更生", "こうせい"),
    ("密輸", "みつゆ"),
    ("脱税", "だつぜい"),
    # three+ element compounds and suffix attachment
    ("哲学者", "てつがくしゃ"),
    ("水道水", "すいどうすい"),
    ("目的地", "もくてきち"),
    ("飛行場", "ひこうじょう"),
    ("自動販売機", "じどうはんばいき"),
    ("蓄電池", "ちくでんち"),
    ("発電機", "はつでんき"),
    ("送電線", "そうでんせん"),
    ("通信網", "つうしんもう"),
    ("銀河系", "ぎんがけい"),
    ("宇宙船", "うちゅうせん"),
    ("原子核", "げんしかく"),
    ("電磁波", "でんじは"),
    ("放射線", "ほうしゃせん"),
    ("化合物", "かごうぶつ"),
    ("投資家", "とうしか"),
    ("外交官", "がいこうかん"),
    ("受刑者", "じゅけいしゃ"),
    ("脳梗塞", "のうこうそく"),
    ("糖尿病", "とうにょうびょう"),
    ("処方箋", "しょほうせん"),
    ("新技術", "しんぎじゅつ"),
    ("体力", "たいりょく"),
    ("言語学者", "げんごがくしゃ"),
    ("理論上", "りろんじょう"),
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


def test_compounds_held_out_of_word_table():
    surfaces = _word_surfaces()
    leaked = [s for s, _ in COMPOUNDS if s in surfaces]
    assert not leaked, (
        f"regression compounds must stay OUT of ja_words.tsv so the "
        f"fallback path is exercised; found in table: {leaked}"
    )
    assert len(COMPOUNDS) >= 100


@pytest.mark.parametrize("surface,kana", COMPOUNDS, ids=[s for s, _ in COMPOUNDS])
def test_compound_reading(surface, kana):
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unknown-kanji skips allowed
        got = japanese_to_romaji_with_accent(surface)
    assert " " not in got, (
        f"{surface}: compound split into multiple accent phrases: {got!r}"
    )
    exp = _expected_romaji(kana)
    # devoicing may uppercase i/u (shown as I/U): compare case-insensitively
    assert _strip_accent(got).lower() == exp.lower(), (
        f"{surface}: read {_strip_accent(got)!r}, expected {exp!r}"
    )


# exact accent-arrow placement for a representative subset: the compound
# rule puts the nucleus on the first mora of a 3+-mora final element,
# makes 1-2-mora finals flat, and the 力/者 suffixes pre-accent the stem
ACCENTED = [
    ("半導体", "ha↑Ndoutai"),           # 2-mora final -> flat
    ("顕微鏡", "ke↑Nbikyou"),           # 2-mora final -> flat
    ("徹夜", "te↑tsuya"),               # 1-mora final -> flat
    ("競争力", "kyo↑usou↓ryoku"),       # 力 pre-accents the stem
    ("哲学者", "te↑tsugaku↓ʃa"),        # 者 pre-accents the stem
    ("新技術", "ʃi↑Ngi↓jutsu"),         # 3-mora final -> nucleus on its 1st mora
    ("自動販売機", "ji↑douhaNbaiki"),   # 1-mora final -> flat
]


@pytest.mark.parametrize("surface,expected", ACCENTED, ids=[s for s, _ in ACCENTED])
def test_compound_accent_arrows(surface, expected):
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = japanese_to_romaji_with_accent(surface)
    assert got == expected


def test_isolated_kanji_keeps_kun_reading():
    cases = [("山", "ya↑ma"), ("体", "ka↑rada"), ("夜", "yo↓ru")]
    for surface, expected in cases:
        got = japanese_to_romaji_with_accent(surface)
        assert _strip_accent(got).lower() == _strip_accent(expected).lower(), (
            f"isolated {surface}: {got!r}"
        )


def test_single_mora_elements_never_geminate():
    """A single-mora on-reading must never be swallowed by sokuon
    gemination: 危機 is きき (kiki), not っき (Qki). Regression for the
    len-1 element bug in _join_on_readings."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    for surface, sub in [("危機", "kIki"), ("機会", "kIkai"),
                         ("期間", "kikaN"), ("帰国", "kIkoku")]:
        got = japanese_to_romaji_with_accent(surface).replace("↑", "").replace("↓", "")
        assert "Q" not in got, (surface, got)
        assert got == sub, (surface, got, sub)
    # while real gemination still applies
    got = japanese_to_romaji_with_accent("学校")
    assert "Qk" in got, got


def test_round5_late_sweep_readings():
    """Misreadings surfaced by the round-5 late probe sweep: lexicalized
    りき/げ/ま/まい variant readings, 献立/丈夫, and 〜中 duration words."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    cases = [
        ("怪力", "kairiki"), ("外科", "geka"), ("意地悪", "ijiwaru"),
        ("客間", "kyakuma"), ("仮病", "kebyou"), ("新米", "shiNmai"),
        ("白米", "hakumai"), ("献立", "koNdate"), ("丈夫", "joubu"),
        ("一日中", "ichinichijuu"), ("一晩中", "hitobaNjuu"),
        ("一年中", "ichineNjuu"),
    ]
    for surface, want in cases:
        got = japanese_to_romaji_with_accent(surface)
        flat = (got.replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch").replace("n", "n"))
        assert flat == want.lower(), (surface, got, want)


def test_first_of_month_dates():
    """一日 is いちにち standalone but ついたち after 〜月 (date context)."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    got = japanese_to_romaji_with_accent("一月一日")
    assert "tsuita" in got.replace("↑", "").replace("↓", "").lower(), got
    got = japanese_to_romaji_with_accent("一日")
    assert "nichi" in got.replace("↑", "").replace("↓", "").replace("ʧ", "ch").lower(), got


def test_round5_sentence_sweep_fixes():
    """Round-5 news-sentence sweep: bare continuative stems (終え/固め/伴い),
    無事=ぶじ, 相次ぐ, financial 市場=しじょう, and false gemination across
    word boundaries (血液検査, 輸出関連株)."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    def flat(s):
        return (japanese_to_romaji_with_accent(s)
                .replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch"))

    assert "katameta" in flat("方針を固めた")
    assert "tomonai" in flat("接近に伴い")
    assert flat("滞在を終え").endswith("oe")
    assert "buji" in flat("無事帰還した")
    assert "aitsuide" in flat("相次いでいる")
    assert "shijou" in flat("株式市場")
    assert "ketsuekike" in flat("血液検査")     # no えっけ gemination
    assert "yushutsuka" in flat("輸出関連株")   # no しゅっか gemination
    assert "fumae" in flat("結果を踏まえ")
    assert "mukae" in flat("開幕を迎え")


def test_okurigana_echo_trimming():
    """Kun readings stored as noun/continuative spellings must not double
    when the surface supplies okurigana: 担う is になう (never にないう),
    膨らむ is ふくらむ, 訪れる is おとずれる; alternative okurigana
    spellings resolve too (祭り, 明るい)."""
    from stabletts_tpu.text.japanese import _trim_okurigana

    assert _trim_okurigana("にない", "う") == "にな"
    assert _trim_okurigana("ふくらみ", "らむ") == "ふく"
    assert _trim_okurigana("おとずれ", "れる") == "おとず"
    assert _trim_okurigana("まつり", "り") == "まつ"
    assert _trim_okurigana("あかり", "るい") == "あか"
    # no trim when there is no echo
    assert _trim_okurigana("やま", "をのぼる") == "やま"
    assert _trim_okurigana("あか", "いぬ") == "あか"


def test_round5_verb_fallback_readings():
    """Verbs surfaced by the round-5 conversational sweep read correctly
    whether from the word dictionary or the trimmed kanji fallback."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    def flat(s):
        return (japanese_to_romaji_with_accent(s)
                .replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch").replace(" ", ""))

    for surface, want in [
        ("町を訪れる", "otozureru"), ("チームを率いる", "hikiiru"),
        ("基準を設ける", "moukeru"), ("物価を抑える", "osaeru"),
        ("役割を担う", "ninau"), ("赤字を補う", "oginau"),
        ("記録に挑む", "idomu"), ("需要が膨らむ", "fukuramu"),
        ("条件が整う", "totonou"), ("健康を損なう", "sokonau"),
        ("急須", "kyuusu"), ("流暢", "ryuuchou"), ("大笑い", "oowarai"),
    ]:
        assert want in flat(surface), (surface, flat(surface))


def test_katakana_loanword_phrases_mid_sentence():
    """A fresh katakana run after a particle matches the word dictionary
    and keeps its own accent phrase (アイスクリーム [5]), instead of being
    swallowed flat into the preceding phrase."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    out = japanese_to_romaji_with_accent("コンビニでアイスクリームを買った。")
    assert "a↑isUkuri↓imu" in out, out
    out = japanese_to_romaji_with_accent("喫茶店でコーヒーを飲む。")
    assert "ko↑ohi↓i" in out, out


def test_okurigana_gemination_trim():
    """A kun continuative's final i-row kana drops before っ/ん (godan
    past through the kanji fallback): 庇った=かばった, never かばいった."""
    from stabletts_tpu.text.japanese import _trim_okurigana

    assert _trim_okurigana("かばい", "った") == "かば"
    assert _trim_okurigana("よみ", "んだ") == "よ"
    assert _trim_okurigana("いき", "った") == "い"
    assert _trim_okurigana("やま", "った") == "やま"  # a-row final: no trim


def test_round5_recipe_sports_sweep():
    """Round-5 recipe/sports sweep fixes: 弱火, 炒める, 収める, 上る,
    飼う, 起こす, 合わせる, 庇う, 采配."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    def flat(s):
        return (japanese_to_romaji_with_accent(s)
                .replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch").replace(" ", ""))

    assert "yowabi" in flat("弱火で炒める")
    assert "itame" in flat("野菜を炒める")
    assert "osameta" in flat("勝利を収めた")
    assert "nobo" in flat("表彰台に上った")
    assert "kai" in flat("犬を飼い始めた")
    assert "okosareru" in flat("毎朝起こされる")
    assert "awase" in flat("砂糖と混ぜ合わせる")
    assert "saihai" in flat("采配を批判された")


def test_okurigana_stem_table():
    """Unseen conjugations read through the stem table (会わせて=あわせて,
    書ける=かける) while isolated/particle contexts keep the isolated kun
    (会を=かいを, 上の=うえの, 話が=はなしが)."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    def flat(s):
        return (japanese_to_romaji_with_accent(s)
                .replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch").replace(" ", ""))

    assert "awasete" in flat("会わせてください")
    assert "kakeru" in flat("書けるようになった")
    assert "yomaserareta" in flat("読ませられた")
    assert "hatarakasareru" in flat("働かされる")
    assert "kaio" in flat("会を開く")
    assert "ueno" in flat("上の階")
    assert "hanashiga" in flat("話がある")


def test_business_register_sweep():
    """Round-5 business sweep: company names, surnames, honorific suffixes,
    and humble verbs."""
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    def flat(s):
        return (japanese_to_romaji_with_accent(s)
                .replace("↑", "").replace("↓", "").lower()
                .replace("ʃ", "sh").replace("ʧ", "ch").replace(" ", ""))

    assert "kabushikigaisha" in flat("株式会社")
    assert "tanaka" in flat("田中様") and "sama" in flat("田中様")
    assert "hasegawasama" in flat("長谷川様")
    assert "dono" in flat("田中殿")
    assert "minasama" in flat("皆様")
    assert "ousama" in flat("王様")
    assert "kamisama" in flat("神様")
    assert "youni" in flat("彼の様に")          # non-suffix 様 stays よう
    assert "uketamawarima" in flat("承りました")
    assert "suzuki" in flat("鈴木です")
