"""Arabic-numeral -> Chinese-numeral conversion ("low" mode), equivalent in
behavior to the reference's vendored cn2an.an2cn (text/cn2an/an2cn.py) for
the inputs the TTS pipeline produces (\\d+(\\.?\\d+)? matches)."""

from __future__ import annotations

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千", "万", "十", "百", "千", "亿", "十", "百", "千", "万", "十", "百", "千"]


def _integer_to_cn(integer: str) -> str:
    integer = str(int(integer))  # strip leading zeros: 007 -> 7
    n = len(integer)
    if n > len(_UNITS):
        raise ValueError(f"number too long: {integer}")
    out = ""
    for i, d in enumerate(integer):
        v = int(d)
        pos = n - i - 1
        if v:
            out += _DIGITS[v] + _UNITS[pos]
        else:
            # section markers (万/亿 positions) always emitted for zeros
            if pos % 4 == 0:
                out += _DIGITS[v] + _UNITS[pos]
            if i > 0 and (not out or out[-1] != "零"):
                out += _DIGITS[v]
    out = (
        out.replace("零零", "零").replace("零万", "万").replace("零亿", "亿").replace("亿万", "亿").strip("零")
    )
    if out[:2] == "一十":
        out = out[1:]
    return out or "零"


def _decimal_to_cn(decimal: str) -> str:
    if not decimal:
        return ""
    decimal = decimal[:16]
    return "点" + "".join(_DIGITS[int(d)] for d in decimal)


def an2cn(text: str) -> str:
    """'123' -> '一百二十三', '3.14' -> '三点一四', '-7' -> '负七'."""
    text = str(text)
    if not text:
        raise ValueError("empty number")
    sign = ""
    if text[0] == "-":
        sign = "负"
        text = text[1:]
    parts = text.split(".")
    if len(parts) == 1:
        return sign + _integer_to_cn(parts[0])
    if len(parts) == 2:
        return sign + _integer_to_cn(parts[0]) + _decimal_to_cn(parts[1])
    raise ValueError(f"bad number format: {text}")
