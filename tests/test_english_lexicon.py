"""English g2p rebuilt on the vendored lexicon (VERDICT r1 #1).

Checks: every lexicon entry and every LTS-fallback output maps entirely onto
the 401-symbol table (the table has ə but NOT ʌ/ɜ — eng_to_ipa conventions);
morphological derivations apply the standard voicing-assimilation rules;
sentence conversion matches eng_to_ipa's output conventions on fixtures.
"""

import random
import re
import string

from stabletts_tpu.text import cleaned_text_to_sequence, symbols
from stabletts_tpu.text.english import (
    _load_lexicon,
    _lookup,
    _rule_g2p,
    english_to_ipa2,
    ipa_convert,
)

_SYMBOL_SET = set(symbols)
_IPA2_SUBS = [("r", "ɹ"), ("ʤ", "dʒ"), ("ʧ", "tʃ")]


def _to_symbolspace(pron: str) -> str:
    for a, b in _IPA2_SUBS:
        pron = pron.replace(a, b)
    return pron


def test_lexicon_loads_and_is_large():
    lex = _load_lexicon()
    assert len(lex) > 3500


def test_every_lexicon_char_is_a_symbol():
    lex = _load_lexicon()
    bad = {}
    for word, pron in lex.items():
        for ch in _to_symbolspace(pron):
            if ch not in _SYMBOL_SET:
                bad.setdefault(ch, word)
    assert not bad, f"non-symbol chars in lexicon: {bad}"


def test_no_banned_vowels():
    """ʌ and ɜ are not in the symbol table; eng_to_ipa never emits them
    (AH->ə, ER->ər) so neither may the lexicon."""
    lex = _load_lexicon()
    offenders = [w for w, p in lex.items() if "ʌ" in p or "ɜ" in p]
    assert offenders == []


def test_morphology_voicing():
    assert _lookup("cats") == "kæts"          # voiceless + s
    assert _lookup("dogs") == "dɔgz"          # voiced + z
    assert _lookup("boxes") in ("bɑksəz", "ˈbɑksəz")  # sibilant + əz (generated row carries the stress eng_to_ipa would)
    assert _lookup("wished") == "wɪʃt"        # voiceless + t
    assert _lookup("played") == "pleɪd"       # vowel + d
    assert _lookup("wanted") in ("wɑntəd", "ˈwɑntəd")      # t/d + əd
    assert _lookup("carries") == "ˈkæriz"
    assert _lookup("carried") == "ˈkærid"
    assert _lookup("stopped") == "stɑpt"      # consonant doubling
    assert _lookup("running") in ("rənɪŋ", "ˈrənɪŋ")
    assert _lookup("making") == "meɪkɪŋ"      # e-drop
    assert _lookup("quickly") == "ˈkwɪkli"  # direct entry wins over derivation
    assert _lookup("happily") == "ˈhæpəli"
    assert _lookup("kindness") == "kaɪndnəs"
    assert _lookup("unhappy") == "ənˈhæpi"    # prefix
    assert _lookup("dog's") == "dɔgz"         # possessive


def test_sentence_conversion():
    out = ipa_convert("the cat sat on the mat")
    assert out == "ðə kæt sæt ɑn ðə mæt"
    out = ipa_convert("hello world")
    assert out == "hɛˈloʊ wərld"


def test_english_to_ipa2_symbols_only():
    sentences = [
        "Hello there, how are you today?",
        "The quick brown fox jumps over the lazy dog.",
        "I'd like 3 cups of coffee for $2.50, please!",
        "Dr. Smith arrived at 10 o'clock on January 3rd, 1999.",
        "Colonel Mustard and the women read unusual books.",
    ]
    for s in sentences:
        chars = english_to_ipa2(s)
        ids = cleaned_text_to_sequence(chars)
        dropped = [c for c in chars if c not in _SYMBOL_SET]
        assert dropped == [], f"dropped {dropped!r} from {s!r}"
        assert len(ids) == len(chars)


def test_lts_fallback_symbols_only():
    rng = random.Random(0)
    for _ in range(300):
        word = "".join(rng.choice(string.ascii_lowercase)
                       for _ in range(rng.randint(1, 14)))
        pron = _to_symbolspace(_rule_g2p(word))
        bad = [c for c in pron if c not in _SYMBOL_SET]
        assert bad == [], f"{word!r} -> {pron!r} has non-symbols {bad}"


def test_irregulars():
    assert _lookup("women") == "ˈwɪmən"
    assert _lookup("colonel") == "ˈkərnəl"
    assert _lookup("children") == "ˈʧɪldrən"
    assert _lookup("said") == "sɛd"
    assert _lookup("through") == "θru"


def test_oov_star_mode(monkeypatch):
    """STABLETTS_EN_OOV=star reproduces eng_to_ipa's word* convention."""
    monkeypatch.setenv("STABLETTS_EN_OOV", "star")
    out = ipa_convert("the zxqvwy")
    assert out == "ðə zxqvwy*"


def test_stress_marks_present():
    lex = _load_lexicon()
    # polysyllabic entries carry stress marks (spot statistical check)
    multi = [p for p in lex.values() if len(p) > 7]
    with_stress = sum(1 for p in multi if "ˈ" in p or "ˌ" in p)
    assert with_stress / len(multi) > 0.8
