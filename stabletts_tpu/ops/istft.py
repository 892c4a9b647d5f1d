"""Inverse STFT with "same" padding for the Vocos head.

Numerics replicate the reference's custom ISTFT (reference:
vocoders/vocos/models/head.py:5-73): per-frame irfft (backward norm), windowing,
overlap-add, division by the window envelope, then trimming
pad = (win_length - hop_length) // 2 samples from both ends.

The overlap-add is implemented without scatter when hop divides win (the shipped
config has win = 4 * hop): each frame is split into win/hop hop-sized chunks and
the chunks are summed as shifted dense signals — pure reshapes and adds, which
XLA fuses into a handful of vectorized ops instead of a serial scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.ops.stft import hann_window


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """[B, T, win] frames -> [B, (T-1)*hop + win] overlap-added signal."""
    b, t, win = frames.shape
    out_len = (t - 1) * hop_length + win
    if win % hop_length == 0:
        r = win // hop_length
        # chunk j of frame i lands at sample (i + j) * hop .. (i + j + 1) * hop.
        # Shift via pad + plain add (NOT at[].add): XLA fuses the pads into
        # one elementwise loop over the output, where the in-place update
        # chain compiled to a reshape/copy/slice-reduce sequence costing ~7x
        # the bandwidth bound (profiled on v5e at [32, 1000, 2048]).
        chunks = frames.reshape(b, t, r, hop_length)
        out = None
        for j in range(r):
            sig = chunks[:, :, j, :].reshape(b, t * hop_length)
            padded = jnp.pad(sig, ((0, 0), (j * hop_length, out_len - t * hop_length - j * hop_length)))
            out = padded if out is None else out + padded
        return out
    # general case: scatter-add
    idx = (jnp.arange(t) * hop_length)[:, None] + jnp.arange(win)[None, :]
    out = jnp.zeros((b, out_len), dtype=frames.dtype)
    return out.at[:, idx.reshape(-1)].add(frames.reshape(b, -1))


def window_envelope(window: np.ndarray, n_frames: int, hop_length: int) -> np.ndarray:
    """Sum of squared windows at each output sample — host-side constant."""
    win = window.shape[0]
    out_len = (n_frames - 1) * hop_length + win
    env = np.zeros(out_len, dtype=np.float64)
    wsq = (window.astype(np.float64)) ** 2
    for i in range(n_frames):
        env[i * hop_length : i * hop_length + win] += wsq
    return env.astype(window.dtype)


def idft_matrix_windowed(n_fft: int, win_length: int) -> jnp.ndarray:
    """[n_fft + 2, n_fft] matrix W such that concat([re, im], -1) @ W equals
    irfft(re + i*im, n_fft) * hann_window — the per-frame iDFT + windowing of
    the ISTFT head as ONE MXU matmul (~4x faster than the TPU FFT path at
    n_fft=2048, and one fewer elementwise pass for the window).

    Built in-graph from iota (not as an embedded constant): the tunneled
    remote-compile service rejects HLO programs with multi-MB literals.
    """
    n_freqs = n_fft // 2 + 1
    k = jax.lax.broadcasted_iota(jnp.float32, (n_freqs, n_fft), 0)
    n = jax.lax.broadcasted_iota(jnp.float32, (n_freqs, n_fft), 1)
    ang = 2.0 * jnp.pi * k * n / n_fft
    # hermitian symmetry: interior bins count twice; DC and nyquist once
    scale = jnp.where((k == 0) | (k == n_freqs - 1), 1.0, 2.0) / n_fft
    cos_part = jnp.cos(ang) * scale
    sin_part = -jnp.sin(ang) * scale
    win = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        win = jnp.pad(win, (0, n_fft - win_length))
    return jnp.concatenate([cos_part, sin_part], axis=0) * win[None, :]


def istft_same_real(
    re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
    matmul_dtype=None, frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Real/imag spectrogram [B, T, n_freqs] each -> waveform [B, T * hop].

    Matmul-iDFT formulation of `istft_same` (no complex dtype, no FFT):
    per-frame inverse transform + window as one MXU matmul, then overlap-add
    and envelope normalization.

    matmul_dtype=bfloat16 quantizes the matmul INPUTS only; accumulation stays
    f32. Quantization noise averages over the ~n_fft summed terms per output
    sample (≈ -85 dB at n_fft=2048) — far below GAN vocoder modeling error —
    while the f32 matmul costs ~4x more MXU time than bf16.

    frame_mask [B, T] (1 = valid frame): fixed-shape serving mode. Spectra of
    masked frames are zeroed and the window envelope is computed in-graph per
    batch item over the VALID frames only, so the result matches running on
    the trimmed [B, T_valid] input (up to 1-ulp envelope rounding: the static
    path sums window^2 in f64, this path in f32) — one compile shape serves
    every output length (no per-length recompile at request time).
    """
    window = hann_window(win_length)
    pad = (win_length - hop_length) // 2
    n_frames = re.shape[1]
    if frame_mask is not None:
        fm = frame_mask.astype(jnp.float32)[..., None]
        re = re * fm.astype(re.dtype)
        im = im * fm.astype(im.dtype)

    w_mat = idft_matrix_windowed(n_fft, win_length)
    spec_cat = jnp.concatenate([re, im], axis=-1).astype(jnp.float32)
    if matmul_dtype is not None and matmul_dtype != jnp.float32:
        frames = jax.lax.dot_general(
            spec_cat.astype(matmul_dtype), w_mat.astype(matmul_dtype),
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:
        frames = jax.lax.dot_general(
            spec_cat, w_mat, (((2,), (0,)), ((), ())), precision="float32"
        )  # [B, T, n_fft], already windowed
    y = overlap_add(frames, hop_length)

    end = -pad or None  # pad == 0 (win == hop): keep everything, y[:, 0:-0] is empty
    if frame_mask is not None:
        # dynamic envelope: OLA of window^2 over valid frames only (matches
        # the envelope the trimmed-input computation would use; beyond the
        # valid region env==0 and y==0, so the guarded division yields 0)
        wsq = jnp.asarray((window.astype(np.float64) ** 2).astype(np.float32))
        env_frames = frame_mask.astype(jnp.float32)[..., None] * wsq[None, None, :]
        env_dyn = overlap_add(env_frames, hop_length)  # [B, out_len]
        return y[:, pad:end] / jnp.maximum(env_dyn[:, pad:end], 1e-11)
    env = window_envelope(window, n_frames, hop_length)
    assert (env[pad:end] > 1e-11).all(), "NOLA violated"
    return y[:, pad:end] / jnp.asarray(env[pad:end])


def istft_same(spec: jnp.ndarray, n_fft: int, hop_length: int, win_length: int) -> jnp.ndarray:
    """Complex spectrogram [B, T, n_freqs] -> waveform [B, T * hop_length].

    "same"-padding ISTFT: output length is (T-1)*hop + win with
    (win - hop) // 2 samples trimmed from each side, i.e. exactly T*hop samples
    when win - hop is even (reference: vocoders/vocos/models/head.py:49-73).
    """
    window = hann_window(win_length)
    pad = (win_length - hop_length) // 2
    n_frames = spec.shape[1]

    ifft = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, T, n_fft], backward norm
    ifft = ifft * jnp.asarray(window)
    y = overlap_add(ifft, hop_length)  # [B, (T-1)*hop + win]

    env = window_envelope(window, n_frames, hop_length)
    end = -pad or None  # pad == 0 (win == hop): keep everything, y[:, 0:-0] is empty
    assert (env[pad:end] > 1e-11).all(), "NOLA violated"
    y = y[:, pad:end] / jnp.asarray(env[pad:end])
    return y
