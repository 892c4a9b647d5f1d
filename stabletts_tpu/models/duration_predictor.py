"""VITS-style duration predictor operating on stop-gradient features
(reference: models/duration_predictor.py:5-40)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int

    @nn.compact
    def __call__(self, x, mask, g, deterministic: bool = True):
        """x: [B, T, C] encoder hidden (will be detached), mask: [B, T],
        g: [B, gin] style vector (detached). Returns log-durations [B, T, 1].

        Gradients are cut exactly where the reference calls .detach()
        (duration_predictor.py:25-26): the predictor trains without touching
        the encoder or reference encoder.
        """
        m = mask[..., None]
        x = jax.lax.stop_gradient(x)
        g = jax.lax.stop_gradient(g)
        x = x + nn.Dense(self.in_channels, name="cond")(g)[:, None, :]
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv1")(x * m)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm1")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="conv2")(x * m)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="norm2")(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        x = nn.Dense(1, name="proj")(x * m)
        return x * m


def duration_loss(logw, logw_, lengths):
    """MSE over log-durations normalized by total text length
    (reference: models/duration_predictor.py:38-40). Reduction in f32."""
    sq = ((logw - logw_).astype(jnp.float32)) ** 2
    return jnp.sum(sq) / jnp.sum(lengths)
