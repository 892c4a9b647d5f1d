"""FLAC decoder tests: native/flac.cpp and the pure-Python fallback.

FLAC is lossless, so encode→decode must reproduce the source PCM exactly.
Fixtures come from tests/flac_writer.py (a from-scratch spec-compliant
encoder) since no flac binary exists in this image. Covers: constant /
verbatim / fixed / LPC / escape-partition subframes, wasted bits, all stereo
decorrelation modes, header-only length probe, and the end-to-end
load_and_resample path the HiFi-TTS recipe depends on (reference:
utils/audio.py:59-74 decoded flac via torchaudio/ffmpeg).
"""

import numpy as np
import pytest

from tests.flac_writer import encode_flac
from stabletts_tpu.utils.flac_py import decode_flac
from stabletts_tpu.utils.audio_io import load_and_resample_audio, load_audio


def _pcm(n: int, seed: int = 0, amp: int = 12000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = amp * np.sin(2 * np.pi * 220 * t / 44100)
    sig += rng.normal(0, 300, size=n)
    return np.clip(sig, -32768, 32767).astype(np.int64)


def _decode_native(data: bytes):
    from stabletts_tpu.native import get_lib
    import ctypes

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    fn = lib.stabletts_flac_decode
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int),
    ]
    buf = np.frombuffer(data, dtype=np.uint8)
    sr = ctypes.c_int(0)
    total = fn(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
               None, 0, ctypes.byref(sr))
    assert total > 0
    out = np.empty(total, dtype=np.float32)
    n = fn(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
           out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), total,
           ctypes.byref(sr))
    assert n > 0
    return out[:n], sr.value


MODES = ["verbatim", "fixed2", "lpc2", "escape", "wasted"]


@pytest.mark.parametrize("mode", MODES)
def test_mono_roundtrip_python(mode):
    pcm = _pcm(10000)
    if mode == "wasted":
        pcm &= ~3
    data = encode_flac(pcm, 44100, mode=mode, block_size=1024)
    wav, sr = decode_flac(data)
    assert sr == 44100
    expected = pcm.astype(np.float32) / 32768.0
    np.testing.assert_allclose(wav, expected, atol=0, rtol=0)


@pytest.mark.parametrize("mode", MODES)
def test_mono_roundtrip_native(mode):
    pcm = _pcm(10000, seed=1)
    if mode == "wasted":
        pcm &= ~3
    data = encode_flac(pcm, 44100, mode=mode, block_size=1024)
    wav, sr = _decode_native(data)
    assert sr == 44100
    expected = pcm.astype(np.float32) / 32768.0
    np.testing.assert_allclose(wav, expected, atol=0, rtol=0)


def test_constant_subframe():
    pcm = np.full(5000, -123, dtype=np.int64)
    data = encode_flac(pcm, 22050, mode="constant")
    wav, sr = decode_flac(data)
    assert sr == 22050
    np.testing.assert_array_equal(wav, np.full(5000, -123 / 32768.0, np.float32))
    wav_n, _ = _decode_native(data)
    np.testing.assert_array_equal(wav_n, wav)


@pytest.mark.parametrize("stereo_mode", ["indep", "left_side", "right_side", "mid_side"])
def test_stereo_decorrelation(stereo_mode):
    left = _pcm(6000, seed=2)
    right = _pcm(6000, seed=3, amp=8000)
    pcm = np.stack([left, right], axis=1)
    data = encode_flac(pcm, 44100, mode="fixed2", stereo_mode=stereo_mode,
                       block_size=512)
    expected = left.astype(np.float32) / 32768.0  # decoders emit channel 0
    wav, _ = decode_flac(data)
    np.testing.assert_allclose(wav, expected, atol=0, rtol=0)
    wav_n, _ = _decode_native(data)
    np.testing.assert_allclose(wav_n, expected, atol=0, rtol=0)


def test_length_probe_and_load(tmp_path):
    """Header-only length query + the full load_and_resample_audio path."""
    pcm = _pcm(44100)
    path = tmp_path / "a.flac"
    path.write_bytes(encode_flac(pcm, 44100))

    wav, sr = load_audio(str(path))
    assert sr == 44100 and wav.shape == (44100,)

    from stabletts_tpu.native import get_lib
    lib = get_lib()
    if lib is not None:
        assert int(lib.stabletts_wav_length(str(path).encode(), 44100)) == 44100
        # resampled length probe
        n16 = int(lib.stabletts_wav_length(str(path).encode(), 16000))
        assert abs(n16 - 16000) <= 2

    out = load_and_resample_audio(str(path), 44100)
    assert out is not None and out.shape[0] == 44100
    np.testing.assert_allclose(out, pcm / 32768.0, atol=1e-6)


def test_flac_extension_agnostic(tmp_path):
    """Container is sniffed by magic, not extension (recipes emit .wav paths
    for files that are actually flac and vice versa on some corpora)."""
    pcm = _pcm(8000)
    path = tmp_path / "mislabeled.wav"
    path.write_bytes(encode_flac(pcm, 44100))
    wav, sr = load_audio(str(path))
    assert sr == 44100
    np.testing.assert_allclose(wav, pcm / 32768.0, atol=1e-6)


def test_hifi_tts_recipe_to_preprocess(tmp_path):
    """The shipped HiFi-TTS recipe emits .flac paths (openslr-109 ships flac);
    the full recipe → preprocess flow must work on them end to end
    (reference: recipes/hifi_tts.py + preprocess.py)."""
    import json

    from stabletts_tpu.data.preprocess import DataConfig, preprocess
    from stabletts_tpu.data.recipes import hifi_tts

    root = tmp_path / "hifi"
    (root / "audio").mkdir(parents=True)
    names = []
    for i in range(2):
        pcm = _pcm(44100, seed=10 + i)
        rel = f"audio/clip{i}.flac"
        (root / rel).write_bytes(encode_flac(pcm, 44100))
        names.append(rel)
    with open(root / "manifest.json", "w", encoding="utf-8") as f:
        for i, rel in enumerate(names):
            f.write(json.dumps({
                "audio_filepath": rel,
                "text_normalized": f"sentence number {i}",
            }) + "\n")

    filelist = tmp_path / "filelist.txt"
    lines = hifi_tts(str(root), str(filelist))
    assert len(lines) == 2

    cfg = DataConfig(
        input_filelist_path=str(filelist),
        output_filelist_path=str(tmp_path / "out.jsonl"),
        mel_output_dir=str(tmp_path / "mels"),
        language="english",
        batch_size=2,
    )
    assert preprocess(cfg) == 2
    records = [json.loads(l) for l in open(tmp_path / "out.jsonl", encoding="utf-8")]
    for rec in records:
        mel = np.load(rec["mel_path"])
        assert 80 <= rec["mel_length"] <= 90
        assert mel.shape[0] == rec["mel_length"]
        assert len(rec["phone"]) > 0


def test_corrupt_flac_fails_cleanly(tmp_path):
    data = bytearray(encode_flac(_pcm(4000), 44100))
    data = data[:80]  # truncate mid-stream
    path = tmp_path / "bad.flac"
    path.write_bytes(bytes(data))
    assert load_and_resample_audio(str(path), 44100) is None
