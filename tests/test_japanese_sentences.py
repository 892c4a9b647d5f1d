"""Sentence-level Japanese pronunciation regression.

Natural full sentences through the complete pipeline (number
verbalization, word dictionary, kanji on/kun fallback, particle
attachment, devoicing, pitch accent). Expected strings hand-verified:
every content-word reading is standard Japanese (handoutai, kenkyuujo,
tateraremashita, hanasemasu, kakanakereba, sanbon with rendaku, asa
hachiji via the kanji-numeral counter reader). Catches regressions any
single-word probe misses: particle boundaries, verb-base lookup,
kanji-numeral conversion, compound joins inside running text.
"""

import warnings

import pytest

from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

SENTENCES = [
    ("今日は良い天気ですね",
     "kyo↓uwa yo↓i te↓Nkidesune"),
    ("明日の朝八時に駅で会いましょう",
     "a↑ʃIta↓no a↓sahaʧijini e↓kide a↑imaʃo↓u"),
    ("私は毎日電車で会社に通っています",
     "wa↑taʃiwa ma↓iniʧi de↑Nʃade ka↑iʃani to↓oQteimasU"),
    ("この建物は百年前に建てられました",
     "ko↑no ta↑te↓monowahyakuneN ma↓eni ta↑te↓raremaʃIta"),
    ("昨日買った本をもう読み終わりました",
     "ki↑no↓u ka↑Qta ho↓Nomou yo↓mi o↑warima↓ʃIta"),
    ("半導体の研究所で新しい技術を開発しています",
     "ha↑Ndoutaino ke↑Nkyuujode a↑taraʃi↓i gi↓jutsuo ka↑ihatsUʃIteimasU"),
    ("冷蔵庫に牛乳と卵が入っています",
     "re↑izo↓ukoni gyu↑unyuuto ta↑ma↓goga ha↓iQteimasU"),
    ("来週の金曜日に友達と映画を見に行きます",
     "ra↑iʃuuno ki↑Nyo↓ubini to↑modaʧIto e↓igao mi↑ni i↑kima↓sU"),
    ("日本語の勉強は難しいですが楽しいです",
     "ni↑hoNgono be↑Nkyouwa mu↑zukaʃi↓idesuga ta↑noʃi↓idesU"),
    ("窓口で切符を二枚買ってください",
     "ma↑do↓guʧide ki↑Qpuonimai ka↑Qtekudasai"),
    ("電話番号を教えていただけますか",
     "de↑Nwa ba↑Ngo↓uo o↑ʃieteitadakemasUka"),
    ("春になると桜の花が咲きます",
     "ha↓runinaruto sa↑kurano ha↑na↓ga sa↑kimasU"),
    ("彼女は英語と中国語が話せます",
     "ka↓nojowa e↑igoto ʧu↑ugokugoga ha↑na↓semasU"),
    ("夏休みに家族で温泉に行きました",
     "na↑tsuya↓sumini ka↓zokude o↑NseNni i↑kima↓ʃIta"),
    ("この料理は少し辛いですが美味しいです",
     "ko↑no ryo↓uriwa sU↑ko↓ʃI ka↑ra↓idesuga o↑iʃiidesU"),
    ("雨が降りそうだから傘を持って行きなさい",
     "a↓mega fu↓risoudakara ka↓sao mo↓Qte i↑kinasai"),
    ("図書館で借りた本を返さなければなりません",
     "to↑ʃo↓kaNde ka↑rita ho↓No ka↓esanakerebanarimaseN"),
    ("先生の説明はとても分かりやすかったです",
     "se↑Nse↓ino se↑tsumeiwatotemo wa↑ka↓riyasUkaQtadesU"),
    ("手紙を書かなければなりません",
     "te↑gamio ka↓kanakerebanarimaseN"),
    ("近くの店で牛乳を三本買いました",
     "ʧi↓kakuno mi↑se↓de gyu↑unyuuosaNboN ka↑ima↓ʃIta"),
]


@pytest.mark.parametrize("text,expected", SENTENCES,
                         ids=[t[:12] for t, _ in SENTENCES])
def test_sentence_pronunciation(text, expected):
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unknown-kanji skips in sentences
        got = japanese_to_romaji_with_accent(text)
    assert got == expected
