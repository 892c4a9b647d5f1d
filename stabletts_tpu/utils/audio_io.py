"""Host-side audio IO: WAV decode + polyphase resampling.

Replaces torchaudio.load / torchaudio.functional.resample (reference:
utils/audio.py:59-74). WAV decodes via scipy, FLAC via the from-scratch
decoders (utils/flac_py.py / native/flac.cpp), mp3 and ogg/vorbis via the
system codec libraries (utils/codecs.py — the same position torchaudio
takes with ffmpeg, one layer lower). Anything else raises a clear error.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Returns (mono float32 waveform in [-1, 1], sample_rate)."""
    # sniff by magic bytes, not extension: recipes may emit either container
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic == b"fLaC":
        from stabletts_tpu.utils.flac_py import decode_flac

        with open(path, "rb") as fh:
            return decode_flac(fh.read())
    if magic == b"OggS":
        from stabletts_tpu.utils.codecs import decode_ogg

        wav, sr = decode_ogg(path)
        return wav[:, 0], sr  # mono via first channel, as the WAV path
    if magic[:3] == b"ID3" or (
        len(magic) >= 2 and magic[0] == 0xFF and (magic[1] & 0xE0) == 0xE0
    ):
        from stabletts_tpu.utils.codecs import decode_mp3

        wav, sr = decode_mp3(path)
        return wav[:, 0], sr
    if magic != b"RIFF":
        ext = os.path.splitext(path)[1].lower()
        raise ValueError(
            f"unsupported audio format {ext!r} (WAV, FLAC, mp3 and ogg are "
            "decodable in this environment; convert others offline)"
        )
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        wav = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        wav = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        wav = (data.astype(np.float32) - 128.0) / 128.0
    else:
        wav = data.astype(np.float32)
    if wav.ndim == 2:
        wav = wav[:, 0]  # mono via first channel (reference: utils/audio.py:68-69)
    return wav, int(sr)


def resample(wav: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (kaiser window), equivalent quality to
    torchaudio.functional.resample."""
    if sr == target_sr:
        return wav
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr, target_sr)
    return resample_poly(wav, target_sr // g, sr // g).astype(np.float32)


def load_and_resample_audio(path: str, target_sr: int) -> Optional[np.ndarray]:
    """Load + mono + resample; returns None on failure
    (reference: utils/audio.py:59-74 returns None on load errors).

    Uses the native C++ loader (WAV parse + windowed-sinc resample,
    native/audio.cpp) when built; falls back to scipy."""
    try:
        from stabletts_tpu.native import load_wav_native

        result = load_wav_native(path, target_sr)
        if result is not None:
            return result[0]
    except Exception:
        pass
    try:
        wav, sr = load_audio(path)
    except Exception as e:  # noqa: BLE001 — mirror reference behavior
        print(str(e))
        return None
    return resample(wav, sr, target_sr)


def save_wav(path: str, wav: np.ndarray, sr: int) -> None:
    from scipy.io import wavfile

    wav = np.clip(wav, -1.0, 1.0)
    wavfile.write(path, sr, (wav * 32767.0).astype(np.int16))
