"""Native C++ component tests: MAS kernel vs numpy oracle, WAV loader vs
scipy, segment loader semantics. Skipped when g++/the lib is unavailable."""

import numpy as np
import pytest

from stabletts_tpu.native import (
    get_lib,
    load_segment_native,
    load_wav_native,
    maximum_path_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib not built")


def test_native_mas_matches_oracle():
    from stabletts_tpu.ops.mas import maximum_path_numpy

    rng = np.random.default_rng(0)
    b, t_y_max, t_x_max = 6, 120, 48
    t_ys = rng.integers(t_x_max, t_y_max + 1, size=b).astype(np.int32)
    t_xs = np.minimum(rng.integers(2, t_x_max + 1, size=b), t_ys).astype(np.int32)
    neg_cent = rng.standard_normal((b, t_y_max, t_x_max)).astype(np.float32)

    expected = maximum_path_numpy(neg_cent.copy(), t_ys, t_xs)
    got = maximum_path_native(neg_cent, t_ys, t_xs)
    np.testing.assert_array_equal(got, expected)
    # multithreaded path identical
    got2 = maximum_path_native(neg_cent, t_ys, t_xs, n_threads=4)
    np.testing.assert_array_equal(got2, expected)


@pytest.fixture
def wav_file(tmp_path):
    from scipy.io import wavfile

    sr = 22050
    t = np.linspace(0, 1.0, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = tmp_path / "tone.wav"
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return str(path), wav, sr


def test_native_wav_load(wav_file):
    path, ref, sr = wav_file
    out = load_wav_native(path, sr)
    assert out is not None
    wav, src_sr = out
    assert src_sr == sr
    assert wav.shape == ref.shape
    np.testing.assert_allclose(wav, ref, atol=2e-4)


def test_native_resample_against_scipy(wav_file):
    path, ref, sr = wav_file
    wav44, _ = load_wav_native(path, 44100)
    assert abs(wav44.shape[0] - 44100) <= 2  # 1 s of audio at the target rate
    from stabletts_tpu.utils.audio_io import resample

    scipy_res = resample(ref, sr, 44100)
    n = min(len(wav44), len(scipy_res))
    # both are windowed-sinc; interiors should agree closely
    np.testing.assert_allclose(wav44[100 : n - 100], scipy_res[100 : n - 100], atol=5e-3)


def test_native_segment_loader(wav_file):
    path, ref, sr = wav_file
    seg = load_segment_native(path, sr, 4096, 0.0)
    assert seg is not None and seg.shape == (4096,)
    np.testing.assert_allclose(seg, ref[:4096], atol=2e-4)
    # short file zero-pads
    seg_long = load_segment_native(path, sr, len(ref) + 1000, 0.5)
    assert seg_long.shape == (len(ref) + 1000,)
    assert np.allclose(seg_long[-1000:], 0.0)


def test_native_float32_and_pcm24(tmp_path):
    import struct

    sr, n = 8000, 1000
    data = (0.25 * np.sin(2 * np.pi * 100 * np.arange(n) / sr)).astype(np.float32)
    # write IEEE float32 wav manually
    path = tmp_path / "f32.wav"
    payload = data.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    hdr += b"data" + struct.pack("<I", len(payload))
    path.write_bytes(hdr + payload)
    out = load_wav_native(str(path), sr)
    assert out is not None
    np.testing.assert_allclose(out[0], data, atol=1e-6)


def test_native_mas_degenerate_lengths():
    # t_x == 0 (fully padded item) used to write path[-1] (heap corruption);
    # t_x > t_y used to read DP row -1 out of bounds
    from stabletts_tpu.native import maximum_path_native

    rng = np.random.default_rng(0)
    neg = rng.standard_normal((3, 6, 8)).astype(np.float32)
    t_ys = np.asarray([6, 6, 4], np.int32)
    t_xs = np.asarray([0, 8, 8], np.int32)  # zero-length and t_x > t_y items
    path = maximum_path_native(neg, t_ys, t_xs)
    if path is None:
        import pytest

        pytest.skip("native lib unavailable")
    assert path.shape == (3, 6, 8)
    # the zero-length item's plane stays all-zero, nothing corrupted
    assert path[0].sum() == 0
    assert np.isfinite(path).all()


def test_native_wav_rejects_malformed_header(tmp_path):
    # channels=0 in the fmt chunk used to SIGFPE the whole process
    import struct

    bad = tmp_path / "bad.wav"
    fmt = struct.pack("<HHIIHH", 1, 0, 44100, 0, 0, 16)  # channels == 0
    data = b"\x00" * 64
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    bad.write_bytes(b"RIFF" + struct.pack("<I", len(payload)) + payload)
    from stabletts_tpu.native import load_wav_native

    assert load_wav_native(str(bad), 44100) is None
