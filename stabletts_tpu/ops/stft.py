"""STFT and log-mel spectrogram ops, XLA-native.

Numerics replicate the reference front-end exactly (reference: utils/audio.py:6-57):
  * reflect-pad by (n_fft - hop) // 2 on each side, then torch.stft(center=False)
  * periodic Hann window
  * magnitude = sqrt(re^2 + im^2 + 1e-6)
  * slaney-scale, slaney-norm mel filterbank (torchaudio MelScale equivalent)
  * log(clamp(mel, min=1e-5))

Output layout is channels-last: [B, T_frames, n_mels] (the reference uses
[B, n_mels, T]; we keep time-major so the mel channel dim maps onto TPU lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.config import MelConfig


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, matching torch.hann_window(periodic=True)."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0  # 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, f * 3.0 / 200.0)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), m * 200.0 / 3.0)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """[n_freqs, n_mels] slaney-scale slaney-normalized triangular filterbank.

    Equivalent to torchaudio.functional.melscale_fbanks(mel_scale='slaney',
    norm='slaney') as used by the reference (utils/audio.py:45).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_slaney(f_min)
    m_max = _hz_to_mel_slaney(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    # slaney normalization: scale each triangle to constant energy per band
    enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
    fb = fb * enorm[None, :]
    return fb.astype(dtype)


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[..., L] -> [..., n_frames, n_fft] overlapping frames (center=False).

    n_frames = 1 + (L - n_fft) // hop_length, matching torch.stft framing.

    When hop divides n_fft (every config here: mel hop=n_fft/4, MRD
    hop_factor 0.25, the 7 mel-loss scales), frames are assembled from
    n_fft/hop shifted views of a hop-strided reshape — pure slice/concat data
    movement instead of a [T, n_fft] gather (gathers lower poorly on TPU).
    """
    length = x.shape[-1]
    n_frames = 1 + (length - n_fft) // hop_length
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        rows = n_frames + r - 1
        # drop the tail that belongs to no complete frame, then view as
        # [rows, hop]; frame t = concat(rows t .. t+r-1)
        x2 = x[..., : rows * hop_length].reshape(x.shape[:-1] + (rows, hop_length))
        return jnp.concatenate(
            [x2[..., i : i + n_frames, :] for i in range(r)], axis=-1
        )
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def stft_magnitude(
    x: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    pad: int,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B, L] waveform -> [B, T, n_freqs] STFT magnitude.

    reflect-pads by `pad` on both sides, frames with center=False, applies a
    periodic Hann window, and returns sqrt(re^2 + im^2 + 1e-6) — matching
    reference utils/audio.py:20-25 bit-for-bit in fp32.
    """
    if window is None:
        window = jnp.asarray(hann_window(win_length))
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = frame_signal(x, n_fft, hop_length)  # [B, T, n_fft]
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-6)


@functools.partial(jax.jit, static_argnames=("cfg",))
def log_mel_spectrogram(x: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """[B, L] waveform -> [B, T, n_mels] log-mel spectrogram.

    Pipeline parity with reference utils/audio.py:29-57 (LogMelSpectrogram):
    STFT magnitude -> slaney mel -> log(clamp(., 1e-5)).
    """
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.pad)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.f_min, cfg.f_max))
    mel = mag @ fb  # [B, T, n_freqs] @ [n_freqs, n_mels]
    return jnp.log(jnp.clip(mel, min=1e-5))


def decompress_mel(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the log compression (reference: utils/audio.py:51-52)."""
    return jnp.exp(x)
