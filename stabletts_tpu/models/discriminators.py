"""GAN discriminators for vocoder training: multi-period (MPD) and
multi-resolution (MRD) (reference: vocoders/vocos/models/discriminator.py).

Audio layout is [B, T]; 2D conv stacks run NHWC. Spectrogram features for MRD
are kept as (real, imag) channel pairs — no complex arithmetic on TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stabletts_tpu.ops.stft import frame_signal, hann_window


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


def fold_weightnorm(params):
    """Differentiably fold flax nn.WeightNorm params into plain conv kernels.

    Input: a param tree where some levels contain `WeightNorm_*` siblings
    holding `<conv>/kernel/scale` entries (the tree created by
    `nn.WeightNorm(nn.Conv(...))`). Output: the same tree with each kernel
    replaced by `v * rsqrt(sum(v^2, all-but-last) + 1e-12) * scale` (flax's
    exact formula) and the WeightNorm entries removed — i.e. params for the
    same modules built with `use_weight_norm=False`.

    Why: the GAN step applies each discriminator 4x per step (D-step and
    G-step, real and fake); under nn.WeightNorm every application re-reads
    and re-normalizes every kernel — for MPD's [5,1,1024,1024] kernels that
    is ~21 MB of reads per application, and for MRD's 78 tiny convs it is
    dozens of ~65 us micro-reduces (profiled at ~10% of the step). Folding
    once per loss evaluation keeps gradients exact (autodiff flows through
    the fold) and feeds all applications the same folded kernels.
    """
    if not isinstance(params, dict):
        return params
    wn_keys = [k for k in params if k.startswith("WeightNorm_")]
    out = {}
    for k, v in params.items():
        if k in wn_keys:
            continue
        out[k] = fold_weightnorm(v) if isinstance(v, dict) else v
    for wk in wn_keys:
        for path, scale in params[wk].items():
            conv_name, param_name, _ = path.rsplit("/", 2)
            v = out[conv_name][param_name]
            # fold assumes flax WeightNorm defaults (eps=1e-12,
            # feature_axes=-1); fail loudly on structure drift
            assert scale.ndim == 1 and scale.shape[0] == v.shape[-1], (
                f"unexpected WeightNorm scale shape {scale.shape} for "
                f"{conv_name}/{param_name} with kernel {v.shape}"
            )
            axes = tuple(range(v.ndim - 1))
            norm = jax.lax.rsqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
            out[conv_name] = dict(out[conv_name])
            out[conv_name][param_name] = v * norm * scale
    return out


def _maybe_wn(conv: nn.Conv, use_weight_norm: bool):
    return nn.WeightNorm(conv) if use_weight_norm else conv


class DiscriminatorP(nn.Module):
    """Period discriminator: 2D convs over period-folded audio
    (reference: discriminator.py:32-75)."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        h = x.reshape(b, t // self.period, self.period, 1)  # NHWC

        fmap = []
        channels = (32, 128, 512, 1024, 1024)
        for i, ch in enumerate(channels):
            stride = (self.stride, 1) if i < 4 else (1, 1)
            conv = _maybe_wn(
                nn.Conv(
                    ch,
                    (self.kernel_size, 1),
                    strides=stride,
                    padding=((self.kernel_size // 2, self.kernel_size // 2), (0, 0)),
                    name=f"convs_{i}",
                ),
                self.use_weight_norm,
            )
            h = _leaky(conv(h))
            if i > 0:
                fmap.append(h)
        h = _maybe_wn(
            nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post"),
            self.use_weight_norm,
        )(h)
        fmap.append(h)
        return h.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """(reference: discriminator.py:11-29).

    Real and fake are two separate calls per period, like the reference.
    Measured dead end (v5e, B=16, full GAN step at 114.6 ms baseline):
    concatenating real|fake into one 2B batch per discriminator — despite
    halving conv-op count — was SLOWER in every placement: both steps
    161.9 ms (the G-step backward then computes and discards the real half's
    input-cotangents), D-step only 136.1 ms (the concat copies and the 2x
    activation working set cost more HBM traffic than the op-count saving
    recovers). The step is data-movement-bound, not op- or FLOP-bound
    (bf16 compute moves it <1%)."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(
                p, use_weight_norm=self.use_weight_norm, name=f"discriminators_{i}"
            )
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


def stft_real_imag(x: jnp.ndarray, n_fft: int, hop: int, win: int) -> jnp.ndarray:
    """Center-padded STFT as real/imag channels: [B, T_frames, n_freqs, 2]
    (torchaudio Spectrogram(power=None) equivalent, center=True reflect)."""
    window = jnp.asarray(hann_window(win))
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(x, n_fft, hop) * window  # reshape-based, no gather
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [B, T, F]
    return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)


class DiscriminatorR(nn.Module):
    """Resolution discriminator over banded complex spectrograms
    (reference: discriminator.py:113-170)."""

    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    use_weight_norm: bool = True
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        n_freqs = self.window_length // 2 + 1
        hop = int(self.window_length * self.hop_factor)
        spec = stft_real_imag(x, self.window_length, hop, self.window_length)
        # [B, T, F, 2]; band-split along frequency
        band_idx = [(int(lo * n_freqs), int(hi * n_freqs)) for lo, hi in self.bands]
        x_bands = [spec[:, :, lo:hi, :] for lo, hi in band_idx]

        fmap = []
        outs = []
        for bi, band in enumerate(x_bands):
            h = band
            for i in range(5):
                k = (3, 9) if i < 4 else (3, 3)
                s = (1, 2) if 0 < i < 4 else (1, 1)
                conv = _maybe_wn(
                    nn.Conv(
                        self.channels, k, strides=s,
                        padding=((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2)),
                        name=f"band_convs_{bi}_{i}",
                    ),
                    self.use_weight_norm,
                )
                h = _leaky(conv(h))
                if i > 0:
                    fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # along frequency
        h = _maybe_wn(
            nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="conv_post"),
            self.use_weight_norm,
        )(h)
        fmap.append(h)
        return h, fmap


class MultiResolutionDiscriminator(nn.Module):
    """(reference: discriminator.py:78-111). Separate real/fake calls —
    see MultiPeriodDiscriminator for the measured batching dead end."""

    fft_sizes: Sequence[int] = (2048, 1024, 512)
    use_weight_norm: bool = True

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, w in enumerate(self.fft_sizes):
            d = DiscriminatorR(
                w, use_weight_norm=self.use_weight_norm, name=f"discriminators_{i}"
            )
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
