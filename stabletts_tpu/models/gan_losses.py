"""GAN vocoder losses (reference: vocoders/vocos/models/loss.py).

All mel scales run through the same XLA log-mel op as the front-end; losses
are pure functions suitable for a single jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax.numpy as jnp

from stabletts_tpu.config import MelConfig
from stabletts_tpu.ops.stft import log_mel_spectrogram


def multi_scale_mel_configs(
    base: MelConfig,
    n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
    window_lengths: Sequence[int] = (32, 64, 128, 256, 512, 1024, 2048),
) -> Tuple[MelConfig, ...]:
    """7-scale mel configs (reference: loss.py:10-18): hop = win/4."""
    return tuple(
        dataclasses.replace(
            base, n_mels=m, n_fft=w, win_length=w, hop_length=w // 4, pad=0
        )
        for m, w in zip(n_mels, window_lengths)
    )


def multi_scale_mel_loss(x: jnp.ndarray, y: jnp.ndarray, configs: Tuple[MelConfig, ...]) -> jnp.ndarray:
    """Sum of L1 log-mel distances across scales (reference: loss.py:24-25).
    x, y: [B, T] waveforms."""
    loss = 0.0
    for cfg in configs:
        loss = loss + jnp.mean(jnp.abs(log_mel_spectrogram(x, cfg) - log_mel_spectrogram(y, cfg)))
    return loss


def single_scale_mel_loss(x: jnp.ndarray, y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """(reference: loss.py:27-35)."""
    return jnp.mean(jnp.abs(log_mel_spectrogram(x, cfg) - log_mel_spectrogram(y, cfg)))


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    # loss reductions run in f32 even under bf16 mixed-precision compute
    return x.astype(jnp.float32)


def feature_loss(fmap_r: List[List[jnp.ndarray]], fmap_g: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """Feature-matching L1, doubled (reference: loss.py:37-43)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(_f32(rl) - _f32(gl)))
    return loss * 2


def discriminator_loss(
    disc_real: List[jnp.ndarray], disc_gen: List[jnp.ndarray]
) -> Tuple[jnp.ndarray, List[jnp.ndarray], List[jnp.ndarray]]:
    """LSGAN discriminator loss (reference: loss.py:50-61)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_gen):
        r_loss = jnp.mean((1 - _f32(dr)) ** 2)
        g_loss = jnp.mean(_f32(dg) ** 2)
        loss = loss + r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs: List[jnp.ndarray]) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """LSGAN generator loss (reference: loss.py:63-70)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1 - _f32(dg)) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
