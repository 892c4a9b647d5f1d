"""Sentence-level English pronunciation regression: natural sentences
through the full pipeline (normalization, numbers, currency, lexicon,
morphology, LTS). Expected strings hand-verified against CMU-convention
IPA; catches regressions single-word probes miss (number/currency
normalization in context, possessives, compound handling, the
-ically/-ally suffix path)."""

import pytest

from stabletts_tpu.text.english import english_to_ipa

SENTENCES = [
    ("The quick brown fox jumps over the lazy dog.",
     "ðə kwɪk braʊn fɑks ʤəmps ˈoʊvər ðə ˈleɪzi dɔg."),
    ("She sells seashells by the seashore every summer morning.",
     "ʃi sɛlz ˈsiʃɛlz baɪ ðə ˈsiʃɔr ˈɛvəri ˈsəmər ˈmɔrnɪŋ."),
    ("Doctor Smith arrived at the hospital around seven thirty.",
     "ˈdɑktər smɪθ əˈraɪvd æt ðə ˈhɑˌspɪtəl əˈraʊnd ˈsɛvən ˈθərti."),
    ("The committee will review the proposal on Tuesday, March 3rd.",
     "ðə kəˈmɪti wɪl ˌriˈvju ðə prəˈpoʊzəl ɑn ˈtuzˌdeɪ, mɑrʧ θərd."),
    ("He bought 25 apples and 3 oranges for $12.50 at the market.",
     "hi bɔt ˈtwɛnti- faɪv ˈæpəlz ænd θri ˈɔrənʤəz fɔr twɛlv ˈdɑlərz, ˈfɪfti sɛnts æt ðə ˈmɑrkət."),
    ("Scientists discovered a remarkable new species in the rainforest.",
     "ˈsaɪəntɪsts dɪˈskəvərd ə rɪˈmɑrkəbəl nu ˈspiʃiz ɪn ðə ˈreɪnˌfɔrəst."),
    ("Her grandmother baked chocolate chip cookies every Sunday afternoon.",
     "hər ˈgrændˌməðər beɪkt ˈʧɔklət ʧɪp ˈkʊkiz ˈɛvəri ˈsənˌdeɪ ˌæftərˈnun."),
    ("The orchestra performed Beethoven's ninth symphony magnificently.",
     "ðə ˈɔrkəstrə pərˈfɔrmd ˈbeɪˌtoʊvənz naɪnθ ˈsɪmfəni mægˈnɪfəsəntli."),
    ("Climate change threatens coastal communities around the world.",
     "ˈklaɪmət ʧeɪnʤ ˈθrɛtənz ˈkoʊstəl kəmˈjunətiz əˈraʊnd ðə wərld."),
    ("The astronauts completed their mission and returned safely to Earth.",
     "ðə ˈæstrəˌnɔts kəmˈplitəd ðɛr ˈmɪʃən ænd rɪˈtərnd ˈseɪfli tu ərθ."),
    ("Please remember to water the plants while we're on vacation.",
     "pliz rɪˈmɛmbər tu ˈwɔtər ðə plænts waɪl wir ɑn veɪˈkeɪʃən."),
    ("The ancient castle stood majestically on the hilltop overlooking the valley.",
     "ðə ˈeɪnʧənt ˈkæsəl stʊd məˈʤɛstɪkli ɑn ðə ˈhɪlˌtɑp ˌoʊvərˈlʊkɪŋ ðə ˈvæli."),
    ("Students should submit their assignments before midnight on Friday.",
     "ˈstudənts ʃʊd səbˈmɪt ðɛr əˈsaɪnmənts bɪˈfɔr ˈmɪdˌnaɪt ɑn ˈfraɪˌdeɪ."),
    ("The entrepreneur launched a successful technology startup in 2019.",
     "ðə ˌɑntrəprəˈnər lɔnʧt ə səkˈsɛsfəl tɛkˈnɑləʤi ˈstɑrtəp ɪn ˈtwɛnti ˈnaɪnˈtin."),
    ("Fresh vegetables and fruits are essential for a healthy diet.",
     "frɛʃ ˈvɛʤtəbəlz ænd fruts ɑr ɪˈsɛnʃəl fɔr ə ˈhɛlθi ˈdaɪət."),
]


@pytest.mark.parametrize("text,expected", SENTENCES,
                         ids=[t[:24] for t, _ in SENTENCES])
def test_sentence_pronunciation(text, expected):
    assert english_to_ipa(text) == expected
