"""Robustness fuzzing: the text frontends must never crash on arbitrary
input and must always produce symbols the model can consume."""

import numpy as np
import pytest

from stabletts_tpu.text import cleaned_text_to_sequence


def _random_text(rng, alphabet, n=40):
    return "".join(chr(c) for c in rng.choice(alphabet, size=rng.integers(1, n)))


@pytest.mark.parametrize("lang", ["english", "chinese", "japanese"])
def test_g2p_never_crashes(lang):
    from stabletts_tpu.text.english import english_to_ipa2
    from stabletts_tpu.text.japanese import japanese_to_ipa2
    from stabletts_tpu.text.mandarin import chinese_to_cnm3

    g2p = {"english": english_to_ipa2, "chinese": chinese_to_cnm3, "japanese": japanese_to_ipa2}[lang]
    rng = np.random.default_rng(0)
    # mixed pools: ascii, cjk, kana, punctuation, emoji-ish, digits
    pools = np.concatenate([
        np.arange(0x20, 0x7F),
        np.arange(0x4E00, 0x4E80),
        np.arange(0x3041, 0x3097),
        np.arange(0x30A1, 0x30F7),
        np.asarray([0x3002, 0xFF01, 0xFF1F, 0x2026, 0x201C, 0x201D]),
        np.arange(0x1F600, 0x1F610),
    ])
    import warnings

    for _ in range(60):
        text = _random_text(rng, pools)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            phones = g2p(text)
        assert isinstance(phones, list)
        ids = cleaned_text_to_sequence(phones)
        assert all(0 <= i < 401 for i in ids)


def test_empty_and_whitespace():
    from stabletts_tpu.text.english import english_to_ipa2
    from stabletts_tpu.text.mandarin import chinese_to_cnm3

    assert chinese_to_cnm3("") == []
    assert isinstance(english_to_ipa2("   "), list)
    assert isinstance(english_to_ipa2("!!!"), list)


def test_number_edge_cases():
    from stabletts_tpu.text.numbers_en import normalize_numbers
    from stabletts_tpu.text.numbers_zh import an2cn

    # huge numbers don't crash
    assert isinstance(normalize_numbers("123456789012"), str)
    assert an2cn("0") == "零"
    # beyond the unit table: digit-by-digit, never a raise (round-5 change)
    assert an2cn("12345678901234567").startswith("一二三四")


def test_router_mixed_fuzz():
    from stabletts_tpu.text.router import auto_g2p

    rng = np.random.default_rng(1)
    pools = np.concatenate([
        np.arange(0x41, 0x7B), np.arange(0x4E00, 0x4E40), np.arange(0x3041, 0x3097),
        np.asarray([0x20, 0x2C, 0x2E]),
    ])
    import warnings

    for _ in range(30):
        text = _random_text(rng, pools)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            phones = auto_g2p(text)
        assert isinstance(phones, list)


def test_huge_numbers_do_not_crash():
    # regression: >= 2e15 used to IndexError in _under_1000 (trillion counts
    # over 999); the scale loop now recurses for oversized counts
    from stabletts_tpu.text.numbers_en import normalize_numbers

    assert normalize_numbers("2000000000000000") == "two quadrillion"
    out = normalize_numbers("12345678901234567890123456789")  # 29 digits
    assert out and "0" not in out


def test_router_digits_follow_surrounding_language():
    # regression: digit spans used to fall through to the Chinese g2p, reading
    # '5' as Mandarin wu3 inside an English sentence
    from stabletts_tpu.text.router import auto_g2p

    phones = auto_g2p("I have 5 apples")
    assert "w3" not in phones and "u3" not in phones
    # 'five' in IPA contains 'f' followed by a vowel + 'v'
    assert "f" in phones and "v" in phones


def test_huge_numbers_do_not_crash():
    """>16-digit numbers (ID-number territory) read digit-by-digit instead
    of raising mid-synthesis (round-5 fuzz find)."""
    from stabletts_tpu.text.numbers_zh import an2cn
    from stabletts_tpu.text.mandarin import chinese_to_cnm3
    from stabletts_tpu.text.japanese import japanese_to_romaji_with_accent

    out = an2cn("2557685903089544876")
    assert out.startswith("二五五七")
    assert chinese_to_cnm3("编号2557685903089544876号")
    assert japanese_to_romaji_with_accent("番号2557685903089544876です")
