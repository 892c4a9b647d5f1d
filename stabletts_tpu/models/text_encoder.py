"""Text encoder: phoneme embedding + DiT-Conv blocks conditioned on the style
vector (reference: models/text_encoder.py:8-44)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stabletts_tpu.nn.blocks import DiTConVBlock
from stabletts_tpu.ops.mask import sequence_mask


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int

    @nn.compact
    def __call__(self, x, c, x_lengths, deterministic: bool = True):
        """x: [B, T] int32 phoneme ids, c: [B, gin] style vector.

        Returns (hidden [B, T, H], mu_x [B, T, out], mask [B, T]).
        """
        emb = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels ** -0.5),
            name="emb",
        )
        h = emb(x) * (self.hidden_channels ** 0.5)
        mask = sequence_mask(x_lengths, x.shape[1], dtype=h.dtype)

        for i in range(self.n_layers):
            h = DiTConVBlock(
                self.hidden_channels,
                self.filter_channels,
                self.n_heads,
                self.kernel_size,
                self.p_dropout,
                self.gin_channels,
                name=f"encoder_{i}",
            )(h, c, mask, deterministic)

        mu_x = nn.Dense(self.out_channels, name="proj")(h) * mask.astype(h.dtype)[..., None]
        return h, mu_x, mask
