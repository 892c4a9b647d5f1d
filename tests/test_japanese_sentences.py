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
     "wa↑taʃiwa ma↓iniʧi de↑Nʃade ka↑iʃani to↑oQteima↓sU"),
    ("この建物は百年前に建てられました",
     "ko↑no ta↑te↓monowahyakuneN ma↓eni ta↑terarema↓ʃIta"),
    ("昨日買った本をもう読み終わりました",
     "ki↑no↓u ka↑Qta ho↓Nomou yo↓mi o↑warima↓ʃIta"),
    ("半導体の研究所で新しい技術を開発しています",
     "ha↑Ndoutaino ke↑Nkyuujode a↑taraʃi↓i gi↓jutsuo ka↑ihatsUʃIteima↓sU"),
    ("冷蔵庫に牛乳と卵が入っています",
     "re↑izo↓ukoni gyu↑unyuuto ta↑ma↓goga ha↑iQteima↓sU"),
    ("来週の金曜日に友達と映画を見に行きます",
     "ra↑iʃuuno ki↑Nyo↓ubini to↑modaʧIto e↓igao mi↑ni i↑kima↓sU"),
    ("日本語の勉強は難しいですが楽しいです",
     "ni↑hoNgono be↑Nkyouwa mu↑zukaʃi↓idesuga ta↑noʃi↓idesU"),
    ("窓口で切符を二枚買ってください",
     "ma↑do↓guʧide ki↑Qpuonimai ka↑Qtekudasai"),
    ("電話番号を教えていただけますか",
     "de↑Nwa ba↑Ngo↓uo o↑ʃieteitadakema↓sUka"),
    ("春になると桜の花が咲きます",
     "ha↓runinaruto sa↑kurano ha↑na↓ga sa↑kima↓sU"),
    ("彼女は英語と中国語が話せます",
     "ka↓nojowa e↑igoto ʧu↑ugokugoga ha↑nasema↓sU"),
    ("夏休みに家族で温泉に行きました",
     "na↑tsuya↓sumini ka↓zokude o↑NseNni i↑kima↓ʃIta"),
    ("この料理は少し辛いですが美味しいです",
     "ko↑no ryo↓uriwa sU↑ko↓ʃI ka↑ra↓idesuga o↑iʃiidesU"),
    ("雨が降りそうだから傘を持って行きなさい",
     "a↓mega fu↓risoudakara ka↓sao mo↓Qte i↑kinasai"),
    ("図書館で借りた本を返さなければなりません",
     "to↑ʃo↓kaNde ka↑rita ho↓No ka↑esanakerebanarimase↓N"),
    ("先生の説明はとても分かりやすかったです",
     "se↑Nse↓ino se↑tsumeiwatotemo wa↑ka↓riyasUkaQtadesU"),
    ("手紙を書かなければなりません",
     "te↑gamio ka↑kanakerebanarimase↓N"),
    ("近くの店で牛乳を三本買いました",
     "ʧI↑ka↓kuno mi↑se↓de gyu↑unyuuosaNboN ka↑ima↓ʃIta"),
    # round-5 news-register corpus (VERDICT r4 #6): particles,
    # auxiliaries (passives, polite accents), counters, suru-compounds —
    # every reading and nucleus hand-verified against standard Tokyo accent
    ("政府は新しい経済政策を発表しました",
     "se↓ifuwa a↑taraʃi↓i ke↓izai se↑isakuo ha↑Qpyouʃima↓ʃIta"),
    ("会議は午後三時から始まる予定です",
     "ka↓igiwa go↓gosaNjikara ha↑jimaru yo↑teidesU"),
    ("昨夜の地震で建物が倒壊しました",
     "sa↑kuyano ji↑ʃiNde ta↑te↓monoga to↑ukaiʃima↓ʃIta"),
    ("警察は容疑者を逮捕したと発表した",
     "ke↑isatsuwa yo↑ugi↓ʃao ta↑ihoʃItato ha↑QpyouʃIta"),
    ("台風の影響で新幹線が運休しています",
     "ta↑ifu↓uno e↑ikyoude ʃi↑Nka↓NseNga u↑NkyuuʃIteima↓sU"),
    ("大学の研究者が新しい治療法を開発した",
     "da↑igakuno ke↑Nkyu↓uʃaga a↑taraʃi↓i ʧi↑ryouhouo ka↑ihatsUʃIta"),
    ("銀行の金利が少し上がりました",
     "gi↑Nkouno ki↓Nriga sU↑ko↓ʃI a↑garima↓ʃIta"),
    ("選挙の結果は夜遅くに判明するでしょう",
     "se↓Nkyono ke↑Qkawa yo↑ru o↑sokuni ha↑Nmeisurudeʃo↓u"),
    ("環境問題について国際会議が開かれました",
     "ka↑Nkyou mo↑Ndainitsuite ko↑kUsai ka↓igiga hi↑rakarema↓ʃIta"),
    ("株価は三日連続で上昇しています",
     "ka↑bukawamiQka re↑Nzokude jo↑uʃouʃIteima↓sU"),
    ("首相は記者会見で質問に答えました",
     "ʃU↑ʃouwa kI↑ʃakaikeNde ʃI↑tsumoNni ko↑taema↓ʃIta"),
    ("この地域の人口は十年間で二割減少した",
     "ko↑no ʧi↓ikino ji↑NkouwajuuneNkaNdeniwari ge↑NʃouʃIta"),
    ("新製品の売り上げは予想を上回りました",
     "ʃi↑Nse↓ihiNno u↑riagewa yo↑souo u↑wamawarima↓ʃIta"),
    ("労働組合は賃金の引き上げを要求しています",
     "ro↑udou ku↑miaiwa ʧi↓NgiNno hI↑kiageo yo↑ukyuuʃIteima↓sU"),
    ("裁判所は被告に有罪判決を言い渡した",
     "sa↑ibaNʃowa hI↑kokuni yu↑uzaihaNketsuo i↑iwataʃIta"),
    ("観光客の数が去年より三割増えました",
     "ka↑Nko↓ukyakuno ka↓zuga kyo↓neNyorisaNwari fu↑ema↓ʃIta"),
    ("市役所で住民票を受け取ってください",
     "ʃi↑ya↓kUʃode ju↑umiNhyouo u↑ketoQtekudasai"),
    ("来月から電気料金が値上がりします",
     "ra↓igetsUkara de↓Nki ryo↓ukiNga ne↑agariʃima↓sU"),
    ("医者は患者に十分な休養を勧めました",
     "i↑ʃawa ka↑Njani ju↑ubu↓Nna kyu↑uyouo sU↑sumema↓ʃIta"),
    ("子供たちは公園で元気に遊んでいます",
     "ko↑domotaʧiwa ko↑ueNde ge↓Nkini a↑soNdeima↓sU"),
    ("祖母は毎朝六時に起きて散歩をします",
     "so↓bowa ma↓iasarokujini o↓kIte sa↑Npooʃima↓sU"),
    ("飛行機は天候不良のため二時間遅れました",
     "hI↑ko↓ukiwa te↑NkoufuryounotamenijikaN o↑kurema↓ʃIta"),
    ("博物館では特別展が開催されています",
     "ha↑kubutsu↓kaNdewa to↑kubetsUteNga ka↑isaisareteima↓sU"),
    ("彼は大学を卒業して商社に就職しました",
     "ka↓rewa da↑igakuo so↑tsugyouʃIte ʃo↑uʃani ʃu↑uʃokUʃima↓ʃIta"),
    ("今年の冬は例年より寒くなるそうです",
     "ko↑toʃino fu↑yu↓wa re↑ineNyori sa↑mu↓kunarusoudesU"),
    ("携帯電話の電源を切ってください",
     "ke↑itai de↑Nwano de↑NgeNo ki↓Qtekudasai"),
    ("練習を重ねて発音が上手になりました",
     "re↑Nʃuuo ka↑sanete ha↑tsuoNga jo↑uzuninarima↓ʃIta"),
    ("世界経済の回復には時間がかかるでしょう",
     "se↓kai ke↓izaino ka↑ifUkuniwa ji↑kaNgakakarudeʃo↓u"),
    ("地元の農家が新鮮な野菜を販売しています",
     "ji↑motono no↓ukaga ʃi↑NseNna ya↑saio ha↑NbaiʃIteima↓sU"),
    ("消防士が火事の現場に駆けつけました",
     "ʃo↑ubo↓uʃiga ka↓jino ge↑Nbani ka↑ketsUkema↓ʃIta"),
    ("新聞によると失業率が改善したそうです",
     "ʃi↑NbuNniyoruto ʃI↑tsugyouritsuga ka↑izeNʃItasoudesU"),
    ("駅前の商店街は週末とても賑やかです",
     "e↑kima↓eno ʃo↑ute↓Ngaiwa ʃu↑umatsUtotemo ni↑gi↓yakadesU"),
    ("教授は学生の質問に丁寧に答えました",
     "kyo↑ujuwa ga↑kUseino ʃI↑tsumoNni te↓ineini ko↑taema↓ʃIta"),
    ("水不足のため節水が呼びかけられています",
     "su↑ifu↓sokunotame se↑Qsuiga yo↑bikakerareteima↓sU"),
    ("オリンピックの開会式が盛大に行われました",
     "o↑riNpiQkuno ka↑ikaiʃIkiga se↑idaini o↑konawarema↓ʃIta"),
    ("量子力学は現代物理学の基礎です",
     "ryo↑uʃirikiga↓kuwa ge↓Ndai bu↑tsuriga↓kuno ki↓sodesU"),
    ("自治体は防災訓練を実施しました",
     "ji↑ʧItaiwa bo↑usaiku↓NreNo ji↑QʃIʃima↓ʃIta"),
    ("会議は来週の月曜日に行われる予定です",
     "ka↓igiwa ra↑iʃuuno ge↑tsuyo↓ubini o↑konawareru yo↑teidesU"),
]


@pytest.mark.parametrize("text,expected", SENTENCES,
                         ids=[t[:12] for t, _ in SENTENCES])
def test_sentence_pronunciation(text, expected):
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unknown-kanji skips in sentences
        got = japanese_to_romaji_with_accent(text)
    assert got == expected


NEWS_COVERAGE = [
    # round-5 coverage sweeps: every sentence must phonemize with ZERO
    # unknown-kanji warnings (readings spot-verified when added)
    "新型コロナウイルスの感染拡大を受けて、政府は緊急事態宣言を発令した。",
    "気象庁によると、今夜から明朝にかけて大雪の恐れがあるという。",
    "国際宇宙ステーションに滞在する宇宙飛行士が実験を行った。",
    "最高裁判所は上告を棄却する判決を下した。",
    "東京株式市場では半導体関連株が値上がりした。",
    "環境省は温室効果ガスの削減目標を引き上げる方針だ。",
    "日銀は金融緩和政策を維持することを決定した。",
    "世界遺産に登録された神社仏閣を訪れる観光客が増加している。",
    "人工知能を活用した自動翻訳の精度が向上している。",
    "憲法改正をめぐる議論が国会で続いている。",
    "再生可能エネルギーの導入が加速している。",
    "少子高齢化対策として子育て支援が拡充された。",
    "受験生は合格発表を緊張した面持ちで待っていた。",
    "伝統工芸品の職人が後継者不足に悩んでいる。",
    "図書館の蔵書がデジタル化され、閲覧が容易になった。",
    "国境の長いトンネルを抜けると雪国であった。",
    "祇園精舎の鐘の声、諸行無常の響きあり。",
    "吾輩は猫である。名前はまだ無い。",
    "琵琶湖は日本最大の湖で、近畿地方の水源となっている。",
    "太平洋側では晴れ、日本海側では雪が降るでしょう。",
]


def test_news_register_coverage_warning_free():
    for s in NEWS_COVERAGE:
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = japanese_to_romaji_with_accent(s)
        assert len(out) > 10, s
