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


class DiscriminatorP(nn.Module):
    """Period discriminator: 2D convs over period-folded audio
    (reference: discriminator.py:32-75)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

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
            conv = nn.WeightNorm(
                nn.Conv(
                    ch,
                    (self.kernel_size, 1),
                    strides=stride,
                    padding=((self.kernel_size // 2, self.kernel_size // 2), (0, 0)),
                    name=f"convs_{i}",
                )
            )
            h = _leaky(conv(h))
            if i > 0:
                fmap.append(h)
        h = nn.WeightNorm(
            nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")
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

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, p in enumerate(self.periods):
            d = DiscriminatorP(p, name=f"discriminators_{i}")
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
    (reference: discriminator.py:113-170).

    TPU layout: the reference runs 5 independent per-band conv stacks
    (`band_convs`, discriminator.py:129-138) — 25 tiny 32-channel convs per
    call. Here the 5 bands are packed into channel *groups* of one conv per
    layer (`feature_group_count=5`): frequency is padded to the widest band
    (1025 -> 5x257, a 1.25x pad), channels become 5x32=160 (>= the 128 MXU
    lanes), and the op count drops 5x. Numerics are preserved exactly:

      * per-band 'same' zero-padding == masking the packed tensor's invalid
        frequency columns after every layer (a conv output column near a
        band's right edge then reads the identical zeros);
      * flax WeightNorm normalizes each output channel over [kh, kw, in/groups]
        — for a grouped kernel that is exactly the per-band per-channel norm;
      * fmaps / band outputs are sliced back out in the reference's band-major
        order, so losses and parity are unchanged.
    """

    window_length: int
    channels: int = 32
    hop_factor: float = 0.25
    bands: Sequence[Tuple[float, float]] = (
        (0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0),
    )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        import numpy as np

        n_freqs = self.window_length // 2 + 1
        hop = int(self.window_length * self.hop_factor)
        spec = stft_real_imag(x, self.window_length, hop, self.window_length)
        # [B, T, F, 2]; band-split along frequency
        band_idx = [(int(lo * n_freqs), int(hi * n_freqs)) for lo, hi in self.bands]
        widths = [hi - lo for lo, hi in band_idx]
        nb, cch = len(band_idx), self.channels
        wmax = max(widths)
        # pack: [B, T, wmax, 2*nb], channel groups band-major (re, im) pairs
        packed = jnp.concatenate(
            [
                jnp.pad(spec[:, :, lo:hi, :], ((0, 0), (0, 0), (0, wmax - (hi - lo)), (0, 0)))
                for lo, hi in band_idx
            ],
            axis=-1,
        )

        # valid band width after each layer (torch conv arithmetic: layers 1-3
        # stride the frequency axis by 2 with pad 4, k=9)
        valid = [list(widths)]
        pw = [wmax]
        for i in range(1, 5):
            shrink = 1 <= i <= 3
            valid.append([(w - 1) // 2 + 1 if shrink else w for w in valid[-1]])
            pw.append((pw[-1] - 1) // 2 + 1 if shrink else pw[-1])

        def freq_mask(layer: int) -> jnp.ndarray:
            m = np.zeros((pw[layer], nb), np.float32)
            for b_, w in enumerate(valid[layer]):
                m[:w, b_] = 1.0
            return jnp.asarray(np.repeat(m, cch, axis=1))[None, None]  # [1,1,W,nb*C]

        h = packed
        layer_outs = []
        for i in range(5):
            k = (3, 9) if i < 4 else (3, 3)
            s = (1, 2) if 0 < i < 4 else (1, 1)
            conv = nn.WeightNorm(
                nn.Conv(
                    cch * nb, k, strides=s,
                    padding=((k[0] // 2, k[0] // 2), (k[1] // 2, k[1] // 2)),
                    feature_group_count=nb,
                    name=f"band_convs_{i}",
                )
            )
            h = _leaky(conv(h)) * freq_mask(i).astype(h.dtype)
            layer_outs.append(h)

        # unpack in the reference's band-major order (discriminator.py:160-166)
        fmap = []
        outs = []
        for b_ in range(nb):
            for i in range(1, 5):
                fmap.append(layer_outs[i][:, :, : valid[i][b_], b_ * cch : (b_ + 1) * cch])
            outs.append(layer_outs[4][:, :, : valid[4][b_], b_ * cch : (b_ + 1) * cch])
        h = jnp.concatenate(outs, axis=2)  # along frequency
        h = nn.WeightNorm(nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)), name="conv_post"))(h)
        fmap.append(h)
        return h, fmap


class MultiResolutionDiscriminator(nn.Module):
    """(reference: discriminator.py:78-111). Separate real/fake calls —
    see MultiPeriodDiscriminator for the measured batching dead end."""

    fft_sizes: Sequence[int] = (2048, 1024, 512)

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i, w in enumerate(self.fft_sizes):
            d = DiscriminatorR(w, name=f"discriminators_{i}")
            r, fr = d(y)
            g, fg = d(y_hat)
            y_d_rs.append(r)
            y_d_gs.append(g)
            fmap_rs.append(fr)
            fmap_gs.append(fg)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
