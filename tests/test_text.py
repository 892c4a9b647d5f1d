"""Symbol table and sequence conversion tests (parity with reference text/)."""

from stabletts_tpu.text import cleaned_text_to_sequence, intersperse, symbols
from stabletts_tpu.text.symbols import SPACE_ID, CNM3_LETTERS, IPA_LETTERS


def test_symbol_count():
    assert len(symbols) == 401
    assert len(CNM3_LETTERS) == 330
    assert len(IPA_LETTERS) == 60
    assert symbols[0] == "_"
    assert symbols[-2:] == ["<sil>", "<asp>"]


def test_symbols_unique():
    assert len(set(symbols)) == len(symbols)


def test_space_id():
    assert symbols[SPACE_ID] == " "


def test_cleaned_text_to_sequence_drops_unknown():
    seq = cleaned_text_to_sequence(["a", "NOT_A_SYMBOL", "b"])
    assert len(seq) == 2
    assert all(symbols[i] in ("a", "b") for i in seq)


def test_intersperse():
    assert intersperse([5, 7, 9], 0) == [0, 5, 0, 7, 0, 9, 0]
    assert intersperse([], 0) == [0]
