"""ctypes bindings for the native C++ components (native/*.cpp).

The shared library is built on demand with g++ (cached next to the sources);
every binding has a pure-Python fallback so the framework works without a
compiler. Components:
  * stabletts_maximum_path — batched MAS DP (CPU threads), the native
    counterpart of the device lax.scan kernel (the reference's only native
    code was the numba MAS kernel, monotonic_align/core.py)
  * stabletts_load_wav / stabletts_load_segment — WAV decode + windowed-sinc
    resampling for the host data path (replaces torchaudio's C++ loader)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstabletts_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


_SOURCES = ("mas.cpp", "audio.cpp", "flac.cpp")


def _build() -> bool:
    sources = [os.path.join(_NATIVE_DIR, f) for f in _SOURCES]
    if not all(os.path.exists(s) for s in sources):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _LIB_PATH, *sources, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Returns the loaded library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = (
            not os.path.exists(_LIB_PATH)
            or any(
                os.path.getmtime(os.path.join(_NATIVE_DIR, f)) > os.path.getmtime(_LIB_PATH)
                for f in _SOURCES
                if os.path.exists(os.path.join(_NATIVE_DIR, f))
            )
        )
        if stale and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.stabletts_maximum_path.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.stabletts_load_wav.restype = ctypes.c_int64
        lib.stabletts_load_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int),
        ]
        lib.stabletts_wav_length.restype = ctypes.c_int64
        lib.stabletts_wav_length.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.stabletts_load_segment.restype = ctypes.c_int
        lib.stabletts_load_segment.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def maximum_path_native(
    neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray, n_threads: int = 8
) -> Optional[np.ndarray]:
    """Batched MAS on the host; returns None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    b, t_y_max, t_x_max = neg_cent.shape
    values = np.ascontiguousarray(neg_cent, dtype=np.float32).copy()
    paths = np.zeros((b, t_y_max, t_x_max), dtype=np.int32)
    t_ys = np.ascontiguousarray(t_ys, dtype=np.int32)
    t_xs = np.ascontiguousarray(t_xs, dtype=np.int32)
    lib.stabletts_maximum_path(
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y_max, t_x_max, n_threads,
    )
    return paths


def load_wav_native(path: str, target_sr: int):
    """Returns (waveform float32, source_sr) or None if unavailable/failed.

    Two-phase: stabletts_wav_length gives the exact post-resample length from
    the headers alone (WAV chunk sizes / FLAC STREAMINFO — no sample decode),
    so the output buffer is sized to the file. stabletts_load_wav returns
    -needed when the buffer is too small, so a rare rounding mismatch retries
    with the exact size instead of silently truncating."""
    lib = get_lib()
    if lib is None:
        return None
    n_expect = int(lib.stabletts_wav_length(path.encode(), target_sr))
    if n_expect <= 0:
        return None
    src_sr = ctypes.c_int(0)
    for _ in range(2):
        out = np.empty(n_expect + 8, dtype=np.float32)
        n = lib.stabletts_load_wav(
            path.encode(), target_sr,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.shape[0], ctypes.byref(src_sr),
        )
        if n > 0:
            return out[:n].copy(), int(src_sr.value)
        if n == 0:
            return None
        n_expect = -n  # buffer too small: exact required length, retry once
    return None


def load_segment_native(
    path: str, target_sr: int, segment_len: int, start_frac: float
) -> Optional[np.ndarray]:
    """Random-crop segment for the vocoder dataloader; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(segment_len, dtype=np.float32)
    ok = lib.stabletts_load_segment(
        path.encode(), target_sr, segment_len, float(start_frac),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if ok else None
