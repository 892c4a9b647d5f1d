"""Minimal FLAC *encoder* — test fixture generator for the FLAC decoders.

No flac/ffmpeg binary exists in this image, so the decoder tests synthesize
their own valid FLAC streams (FLAC is lossless: encode→decode must be
bit-exact against the source PCM). Emits real spec-compliant files: correct
STREAMINFO, frame-header CRC8 / frame CRC16, UTF-8 coded frame numbers, and a
choice of subframe strategies (constant / verbatim / fixed-order-2 Rice /
LPC-order-2 Rice) and stereo decorrelation modes, to exercise every decoder
path (native/flac.cpp and stabletts_tpu/utils/flac_py.py).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def swrite(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    caps = {1: 11, 2: 16, 3: 21, 4: 26, 5: 31, 6: 36}
    for ne in range(1, 7):
        if bits <= caps[ne]:
            n_extra = ne
            break
    else:
        raise ValueError("number too large")
    lead_bits = {1: 5, 2: 4, 3: 3, 4: 2, 5: 1, 6: 0}[n_extra]
    lead_marker = {1: 0xC0, 2: 0xE0, 3: 0xF0, 4: 0xF8, 5: 0xFC, 6: 0xFE}[n_extra]
    shift = 6 * n_extra
    out.append(lead_marker | ((n >> shift) & ((1 << lead_bits) - 1)))
    for i in range(n_extra):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _rice_write(bw: _BitWriter, values, param: int) -> None:
    for v in values:
        v = int(v)
        u = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q, r = u >> param, u & ((1 << param) - 1)
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        if param:
            bw.write(r, param)


def _best_rice_param(values) -> int:
    if len(values) == 0:
        return 0
    mean = float(np.mean([abs(int(v)) for v in values])) + 1.0
    return min(14, max(0, int(np.log2(mean)) + 1))


def _write_subframe(bw: _BitWriter, samples: np.ndarray, bps: int, mode: str) -> None:
    samples = samples.astype(np.int64)
    n = len(samples)
    bw.write(0, 1)  # padding
    if mode == "constant":
        assert np.all(samples == samples[0])
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.swrite(int(samples[0]), bps)
    elif mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for s in samples:
            bw.swrite(int(s), bps)
    elif mode == "wasted":
        # verbatim with 2 wasted bits (samples must have low 2 bits zero)
        assert np.all(samples & 3 == 0)
        bw.write(1, 6)
        bw.write(1, 1)          # wasted flag
        bw.write(0, 1)          # unary 1 → wasted = 1 + 1 = 2
        bw.write(1, 1)
        for s in samples:
            bw.swrite(int(s) >> 2, bps - 2)
    elif mode == "fixed2":
        order = min(2, n)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.swrite(int(s), bps)
        if order == 2:
            resid = samples[2:] - 2 * samples[1:-1] + samples[:-2]
        else:
            resid = samples[order:]
        param = _best_rice_param(resid)
        bw.write(0, 2)   # rice method 0
        bw.write(0, 4)   # partition order 0
        bw.write(param, 4)
        _rice_write(bw, resid, param)
    elif mode == "escape":
        # fixed order 0 with an escape partition (raw-bits residual)
        bw.write(8, 6)
        bw.write(0, 1)
        bw.write(0, 2)    # rice method 0
        bw.write(0, 4)    # partition order 0
        bw.write(0x0F, 4)  # escape code
        bw.write(bps, 5)  # raw bits per residual
        for s in samples:
            bw.swrite(int(s), bps)
    elif mode == "lpc2":
        order, precision, shift = 2, 12, 9
        coef = [int(1.6 * (1 << shift)), int(-0.65 * (1 << shift))]
        assert n > order
        bw.write(32 + order - 1, 6)
        bw.write(0, 1)
        for s in samples[:order]:
            bw.swrite(int(s), bps)
        pred = (coef[0] * samples[1:-1] + coef[1] * samples[:-2]) >> shift
        resid = samples[2:] - pred
        bw.write(precision - 1, 4)
        bw.swrite(shift, 5)
        for c in coef:
            bw.swrite(c, precision)
        param = _best_rice_param(resid)
        bw.write(0, 2)
        bw.write(0, 4)
        bw.write(param, 4)
        _rice_write(bw, resid, param)
    else:
        raise ValueError(mode)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    mode: str = "fixed2",
    stereo_mode: str = "indep",
) -> bytes:
    """pcm: int array [n] (mono) or [n, 2] (stereo), values in [-2^(bps-1), 2^(bps-1))."""
    pcm = np.asarray(pcm, dtype=np.int64)
    stereo = pcm.ndim == 2
    channels = 2 if stereo else 1
    n_total = pcm.shape[0]

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n_total, 36)
    si_bytes = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(si_bytes).to_bytes(3, "big") + si_bytes

    frame_idx = 0
    pos = 0
    while pos < n_total:
        bs = min(block_size, n_total - pos)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize strategy
        hdr.write(7, 4)  # blocksize: 16-bit field at end of header
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        if not stereo:
            ch_code = 0
        elif stereo_mode == "indep":
            ch_code = 1
        elif stereo_mode == "left_side":
            ch_code = 8
        elif stereo_mode == "right_side":
            ch_code = 9
        elif stereo_mode == "mid_side":
            ch_code = 10
        else:
            raise ValueError(stereo_mode)
        hdr.write(ch_code, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        hdr.write(ss_code, 3)
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes())
        hdr_bytes += _utf8_number(frame_idx)
        hdr_bytes += (bs - 1).to_bytes(2, "big")
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = _BitWriter()
        block = pcm[pos:pos + bs]
        if stereo:
            left, right = block[:, 0], block[:, 1]
            if stereo_mode == "indep":
                subs = [(left, bps), (right, bps)]
            elif stereo_mode == "left_side":
                subs = [(left, bps), (left - right, bps + 1)]
            elif stereo_mode == "right_side":
                subs = [(left - right, bps + 1), (right, bps)]
            else:  # mid_side
                subs = [((left + right) >> 1, bps), (left - right, bps + 1)]
        else:
            subs = [(block, bps)]
        for samples, sub_bps in subs:
            sub_mode = mode
            if mode in ("fixed2", "lpc2") and bs <= 2:
                sub_mode = "verbatim"
            if mode == "constant" and not np.all(samples == samples[0]):
                sub_mode = "verbatim"
            _write_subframe(body, samples, sub_bps, sub_mode)
        body.align()
        frame = bytes(hdr_bytes) + body.bytes()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        pos += bs
        frame_idx += 1
    return bytes(out)
