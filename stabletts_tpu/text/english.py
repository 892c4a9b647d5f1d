"""English g2p: text -> IPA2 character list (reference: text/english.py).

The normalization pipeline (abbreviations, numbers, currency, ordinals)
matches the reference's tacotron-derived cleaners. The IPA conversion itself
replaces `eng_to_ipa` (whose CMU-dict data is unavailable in this image) with
a built-in exception lexicon + letter-to-sound rules; output uses the same
IPA inventory and the same ipa->ipa2 substitutions (r->ɹ, ʤ->dʒ, ʧ->tʃ) and
dark-l marking as the reference.
"""

from __future__ import annotations

import re
import unicodedata
from typing import List

from stabletts_tpu.text.numbers_en import normalize_numbers

_abbreviations = [
    (re.compile(rf"\b{abbr}\.", re.IGNORECASE), expansion)
    for abbr, expansion in [
        ("mrs", "misess"), ("mr", "mister"), ("dr", "doctor"), ("st", "saint"),
        ("co", "company"), ("jr", "junior"), ("maj", "major"), ("gen", "general"),
        ("drs", "doctors"), ("rev", "reverend"), ("lt", "lieutenant"),
        ("hon", "honorable"), ("sgt", "sergeant"), ("capt", "captain"),
        ("esq", "esquire"), ("ltd", "limited"), ("col", "colonel"), ("ft", "fort"),
    ]
]

_ipa_to_ipa2 = [(re.compile(p), r) for p, r in [("r", "ɹ"), ("ʤ", "dʒ"), ("ʧ", "tʃ")]]

# high-frequency words with irregular spellings (exception lexicon)
_LEXICON = {
    "the": "ðə", "of": "ʌv", "and": "ænd", "a": "ə", "to": "tu", "in": "ɪn",
    "is": "ɪz", "you": "ju", "that": "ðæt", "it": "ɪt", "he": "hi", "was": "wʌz",
    "for": "fɔr", "on": "ɑn", "are": "ɑr", "as": "æz", "with": "wɪð",
    "his": "hɪz", "they": "ðeɪ", "i": "aɪ", "at": "æt", "be": "bi", "this": "ðɪs",
    "have": "hæv", "from": "frʌm", "or": "ɔr", "one": "wʌn", "had": "hæd",
    "by": "baɪ", "word": "wɜrd", "but": "bʌt", "not": "nɑt", "what": "wʌt",
    "all": "ɔl", "were": "wɜr", "we": "wi", "when": "wɛn", "your": "jʊr",
    "can": "kæn", "said": "sɛd", "there": "ðɛr", "use": "juz", "an": "æn",
    "each": "iʧ", "which": "wɪʧ", "she": "ʃi", "do": "du", "how": "haʊ",
    "their": "ðɛr", "if": "ɪf", "will": "wɪl", "up": "ʌp", "other": "ˈʌðər",
    "about": "əˈbaʊt", "out": "aʊt", "many": "ˈmɛni", "then": "ðɛn",
    "them": "ðɛm", "these": "ðiz", "so": "soʊ", "some": "sʌm", "her": "hɜr",
    "would": "wʊd", "make": "meɪk", "like": "laɪk", "him": "hɪm", "into": "ˈɪntu",
    "time": "taɪm", "has": "hæz", "look": "lʊk", "two": "tu", "more": "mɔr",
    "write": "raɪt", "go": "goʊ", "see": "si", "number": "ˈnʌmbər", "no": "noʊ",
    "way": "weɪ", "could": "kʊd", "people": "ˈpipəl", "my": "maɪ", "than": "ðæn",
    "first": "fɜrst", "water": "ˈwɔtər", "been": "bɪn", "who": "hu", "oil": "ɔɪl",
    "its": "ɪts", "now": "naʊ", "find": "faɪnd", "long": "lɔŋ", "down": "daʊn",
    "day": "deɪ", "did": "dɪd", "get": "gɛt", "come": "kʌm", "made": "meɪd",
    "may": "meɪ", "part": "pɑrt", "over": "ˈoʊvər", "new": "nu", "sound": "saʊnd",
    "take": "teɪk", "only": "ˈoʊnli", "little": "ˈlɪtəl", "work": "wɜrk",
    "know": "noʊ", "place": "pleɪs", "year": "jɪr", "live": "lɪv", "me": "mi",
    "back": "bæk", "give": "gɪv", "most": "moʊst", "very": "ˈvɛri",
    "after": "ˈæftər", "thing": "θɪŋ", "our": "aʊər", "just": "ʤʌst",
    "name": "neɪm", "good": "gʊd", "sentence": "ˈsɛntəns", "man": "mæn",
    "think": "θɪŋk", "say": "seɪ", "great": "greɪt", "where": "wɛr",
    "help": "hɛlp", "through": "θru", "much": "mʌʧ", "before": "bɪˈfɔr",
    "line": "laɪn", "right": "raɪt", "too": "tu", "mean": "min", "old": "oʊld",
    "any": "ˈɛni", "same": "seɪm", "tell": "tɛl", "boy": "bɔɪ", "follow": "ˈfɑloʊ",
    "came": "keɪm", "want": "wɑnt", "show": "ʃoʊ", "also": "ˈɔlsoʊ",
    "around": "əˈraʊnd", "form": "fɔrm", "three": "θri", "small": "smɔl",
    "set": "sɛt", "put": "pʊt", "end": "ɛnd", "does": "dʌz", "another": "əˈnʌðər",
    "well": "wɛl", "large": "lɑrʤ", "must": "mʌst", "big": "bɪg", "even": "ˈivən",
    "such": "sʌʧ", "because": "bɪˈkɔz", "here": "hir", "why": "waɪ", "ask": "æsk",
    "went": "wɛnt", "men": "mɛn", "read": "rid", "need": "nid", "land": "lænd",
    "different": "ˈdɪfərənt", "home": "hoʊm", "us": "ʌs", "move": "muv",
    "try": "traɪ", "kind": "kaɪnd", "hand": "hænd", "picture": "ˈpɪkʧər",
    "again": "əˈgɛn", "change": "ʧeɪnʤ", "off": "ɔf", "play": "pleɪ",
    "spell": "spɛl", "air": "ɛr", "away": "əˈweɪ", "animal": "ˈænəməl",
    "house": "haʊs", "point": "pɔɪnt", "page": "peɪʤ", "letter": "ˈlɛtər",
    "mother": "ˈmʌðər", "answer": "ˈænsər", "found": "faʊnd", "study": "ˈstʌdi",
    "still": "stɪl", "learn": "lɜrn", "should": "ʃʊd", "world": "wɜrld",
    "high": "haɪ", "every": "ˈɛvəri", "near": "nir", "add": "æd", "food": "fud",
    "between": "bɪˈtwin", "own": "oʊn", "below": "bɪˈloʊ", "country": "ˈkʌntri",
    "plant": "plænt", "last": "læst", "school": "skul", "father": "ˈfɑðər",
    "keep": "kip", "tree": "tri", "never": "ˈnɛvər", "start": "stɑrt",
    "city": "ˈsɪti", "earth": "ɜrθ", "eye": "aɪ", "light": "laɪt",
    "thought": "θɔt", "head": "hɛd", "under": "ˈʌndər", "story": "ˈstɔri",
    "saw": "sɔ", "left": "lɛft", "don't": "doʊnt", "few": "fju", "while": "waɪl",
    "along": "əˈlɔŋ", "might": "maɪt", "close": "kloʊs", "something": "ˈsʌmθɪŋ",
    "seem": "sim", "next": "nɛkst", "hard": "hɑrd", "open": "ˈoʊpən",
    "example": "ɪgˈzæmpəl", "begin": "bɪˈgɪn", "life": "laɪf", "always": "ˈɔlˌweɪz",
    "those": "ðoʊz", "both": "boʊθ", "paper": "ˈpeɪpər", "together": "təˈgɛðər",
    "got": "gɑt", "group": "grup", "often": "ˈɔfən", "run": "rʌn",
    "important": "ɪmˈpɔrtənt", "until": "ənˈtɪl", "children": "ˈʧɪldrən",
    "side": "saɪd", "feet": "fit", "car": "kɑr", "mile": "maɪl", "night": "naɪt",
    "walk": "wɔk", "white": "waɪt", "sea": "si", "began": "bɪˈgæn", "grow": "groʊ",
    "took": "tʊk", "river": "ˈrɪvər", "four": "fɔr", "carry": "ˈkæri",
    "state": "steɪt", "once": "wʌns", "book": "bʊk", "hear": "hir", "stop": "stɑp",
    "without": "wɪˈðaʊt", "second": "ˈsɛkənd", "later": "ˈleɪtər", "miss": "mɪs",
    "idea": "aɪˈdiə", "enough": "ɪˈnʌf", "eat": "it", "face": "feɪs",
    "watch": "wɑʧ", "far": "fɑr", "really": "ˈrɪli", "almost": "ˈɔlˌmoʊst",
    "let": "lɛt", "above": "əˈbʌv", "girl": "gɜrl", "sometimes": "ˈsʌmˌtaɪmz",
    "mountain": "ˈmaʊntən", "cut": "kʌt", "young": "jʌŋ", "talk": "tɔk",
    "soon": "sun", "list": "lɪst", "song": "sɔŋ", "being": "ˈbiɪŋ",
    "leave": "liv", "family": "ˈfæməli", "it's": "ɪts", "hello": "hɛˈloʊ",
    "world's": "wɜrldz", "speech": "spiʧ", "voice": "vɔɪs", "language": "ˈlæŋgwəʤ",
}

# letter-to-sound rules, tried in order at each position (longest first)
_LTS_RULES = [
    # multi-letter patterns
    ("tion", "ʃən"), ("sion", "ʒən"), ("ight", "aɪt"), ("ough", "oʊ"),
    ("augh", "ɔ"), ("eigh", "eɪ"), ("tch", "ʧ"), ("dge", "ʤ"), ("igh", "aɪ"),
    ("sch", "sk"), ("ear", "ɪr"), ("oar", "ɔr"), ("our", "ɔr"), ("air", "ɛr"),
    ("eer", "ɪr"), ("ai", "eɪ"), ("ay", "eɪ"), ("ee", "i"), ("ea", "i"),
    ("oa", "oʊ"), ("oo", "u"), ("ou", "aʊ"), ("ow", "oʊ"), ("oi", "ɔɪ"),
    ("oy", "ɔɪ"), ("au", "ɔ"), ("aw", "ɔ"), ("ew", "u"), ("ue", "u"),
    ("ui", "u"), ("ie", "i"), ("ei", "eɪ"), ("ey", "eɪ"),
    ("ar", "ɑr"), ("er", "ər"), ("ir", "ɜr"), ("ur", "ɜr"), ("or", "ɔr"),
    ("th", "θ"), ("sh", "ʃ"), ("ch", "ʧ"), ("ph", "f"), ("wh", "w"),
    ("ck", "k"), ("ng", "ŋ"), ("qu", "kw"), ("gh", ""), ("kn", "n"),
    ("wr", "r"), ("mb", "m"), ("gn", "n"), ("ps", "s"),
    # single letters
    ("a", "æ"), ("b", "b"), ("d", "d"), ("e", "ɛ"), ("f", "f"), ("g", "g"),
    ("h", "h"), ("i", "ɪ"), ("j", "ʤ"), ("k", "k"), ("l", "l"), ("m", "m"),
    ("n", "n"), ("o", "ɑ"), ("p", "p"), ("r", "r"), ("s", "s"), ("t", "t"),
    ("u", "ʌ"), ("v", "v"), ("w", "w"), ("x", "ks"), ("y", "j"), ("z", "z"),
]
_VOWELS = "aeiou"


def _rule_g2p(word: str) -> str:
    """Letter-to-sound fallback for out-of-lexicon words."""
    w = word.lower()
    # soft c/g before e/i/y
    w = re.sub(r"c(?=[eiy])", "s", w)
    w = re.sub(r"g(?=[eiy])", "ʤ", w)
    w = w.replace("c", "k")
    # magic-e: final silent e lengthens the previous vowel
    magic = {"a": "eɪ", "i": "aɪ", "o": "oʊ", "u": "ju", "e": "i"}
    m = re.search(r"([aeiou])([bdfgklmnprstvzʤ])e$", w)
    if m and len(w) > 3:
        w = w[: m.start(1)] + "\x00" + magic[m.group(1)] + "\x01" + m.group(2) + w[m.end(2) + 1 :]
    out = []
    i = 0
    while i < len(w):
        if w[i] == "\x00":  # protected span from magic-e
            j = w.index("\x01", i)
            out.append(w[i + 1 : j])
            i = j + 1
            continue
        # final silent e
        if w[i] == "e" and i == len(w) - 1 and len(w) > 2 and out:
            i += 1
            continue
        for pat, rep in _LTS_RULES:
            if w.startswith(pat, i):
                # 'y' at word end or after consonant cluster acts as vowel
                if pat == "y" and i == len(w) - 1:
                    rep = "aɪ" if len(w) <= 3 else "i"
                out.append(rep)
                i += len(pat)
                break
        else:
            out.append(w[i])
            i += 1
    return "".join(out)


def asciify(text: str) -> str:
    """unidecode-lite: NFKD-decompose and strip non-ASCII marks."""
    decomposed = unicodedata.normalize("NFKD", text)
    return "".join(c for c in decomposed if ord(c) < 128)


def expand_abbreviations(text: str) -> str:
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def collapse_whitespace(text: str) -> str:
    return re.sub(r"\s+", " ", text)


_WORD_RE = re.compile(r"[a-z']+|[^a-z' ]")


def ipa_convert(text: str) -> str:
    """CMU-dict-free replacement for eng_to_ipa.convert: lexicon first,
    letter-to-sound rules otherwise. Punctuation passes through."""
    pieces = []
    for token in _WORD_RE.findall(text):
        if token[0].isalpha() or token[0] == "'":
            pieces.append(_LEXICON.get(token, _rule_g2p(token)))
            pieces.append(" ")
        else:
            if pieces and pieces[-1] == " ":
                pieces.pop()
            pieces.append(token)
            pieces.append(" ")
    return "".join(pieces).strip()


def mark_dark_l(text: str) -> str:
    return re.sub(r"l([^aeiouæɑɔəɛɪʊ ]*(?: |$))", lambda x: "ɫ" + x.group(1), text)


def english_to_ipa(text: str) -> str:
    text = asciify(text).lower()
    text = expand_abbreviations(text)
    text = normalize_numbers(text)
    phonemes = ipa_convert(text)
    return collapse_whitespace(phonemes)


def english_to_ipa2(text: str) -> List[str]:
    """(reference: text/english.py:169-175)."""
    text = english_to_ipa(text)
    text = mark_dark_l(text)
    for regex, replacement in _ipa_to_ipa2:
        text = re.sub(regex, replacement, text)
    return list(text.replace("...", "…"))
