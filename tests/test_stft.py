"""STFT / log-mel parity tests.

The STFT magnitude is checked against torch.stft with the reference's exact
settings (reflect pad (n_fft-hop)//2, center=False, periodic Hann), i.e. the
pipeline of reference utils/audio.py:6-26. The mel filterbank is checked
against an independent reimplementation of the slaney-scale algorithm plus
structural properties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from stabletts_tpu.config import MelConfig
from stabletts_tpu.ops.stft import (
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
    stft_magnitude,
)

torch = pytest.importorskip("torch")


def _torch_ref_stft_mag(x_np, cfg: MelConfig):
    """Reference LinearSpectrogram numerics via torch.stft (utils/audio.py:20-25)."""
    x = torch.from_numpy(x_np)
    x = torch.nn.functional.pad(x.unsqueeze(1), (cfg.pad, cfg.pad), "reflect").squeeze(1)
    window = torch.hann_window(cfg.win_length)
    spec = torch.stft(
        x, cfg.n_fft, cfg.hop_length, cfg.win_length, window,
        center=False, normalized=False, onesided=True, return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # [B, n_freqs, T]


def test_stft_magnitude_matches_torch():
    cfg = MelConfig()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 44100), dtype=np.float32) * 0.3
    ref = _torch_ref_stft_mag(x, cfg)  # [B, F, T]
    got = np.asarray(stft_magnitude(jnp.asarray(x), cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.pad))
    assert got.shape == (2, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=2e-4, atol=2e-4)


def test_frame_count_is_same_padding():
    # pad=(n_fft-hop)//2 should give ceil(L/hop) frames for L multiple of hop
    cfg = MelConfig()
    x = jnp.zeros((1, 512 * 50))
    mag = stft_magnitude(x, cfg.n_fft, cfg.hop_length, cfg.win_length, cfg.pad)
    assert mag.shape[1] == 50


def test_hann_window_periodic():
    w = hann_window(8)
    ref = torch.hann_window(8).numpy()
    np.testing.assert_allclose(w, ref, atol=1e-6)


def _slaney_fb_independent(sr, n_fft, n_mels):
    """Independent construction following the librosa algorithm (htk=False, norm='slaney')."""
    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, dtype=np.float64))
        mel = f / (200.0 / 3.0)
        logstep = np.log(6.4) / 27.0
        sel = f >= 1000.0
        mel[sel] = 15.0 + np.log(f[sel] / 1000.0) / logstep
        return mel

    def mel_to_hz(m):
        m = np.atleast_1d(np.asarray(m, dtype=np.float64))
        f = m * (200.0 / 3.0)
        logstep = np.log(6.4) / 27.0
        sel = m >= 15.0
        f[sel] = 1000.0 * np.exp(logstep * (m[sel] - 15.0))
        return f

    fftfreqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0)[0], hz_to_mel(sr / 2.0)[0], n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T  # [n_freqs, n_mels]


def test_mel_filterbank_matches_independent_impl():
    cfg = MelConfig()
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels)
    ref = _slaney_fb_independent(cfg.sample_rate, cfg.n_fft, cfg.n_mels)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-7)
    # every filter has nonzero support and triangles overlap
    assert (fb.sum(axis=0) > 0).all()


def test_log_mel_pipeline():
    cfg = MelConfig()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 22050), dtype=np.float32) * 0.1
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    # n_frames = 1 + (L + 2*pad - n_fft) // hop = 1 + (L - hop) // hop
    assert mel.shape == (1, 1 + (22050 - 512) // 512, 128)
    # log(clamp(., 1e-5)) floor
    assert mel.min() >= np.log(1e-5) - 1e-6

    # cross-check against torch pipeline with the same filterbank
    ref_mag = _torch_ref_stft_mag(x, cfg)  # [B, F, T]
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels).astype(np.float64)
    ref_mel = np.log(np.clip(ref_mag.transpose(0, 2, 1).astype(np.float64) @ fb, 1e-5, None))
    np.testing.assert_allclose(mel, ref_mel, rtol=1e-3, atol=2e-4)
