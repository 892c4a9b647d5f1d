"""Flow-matching velocity estimator: DiT U-Net with FiLM timestep conditioning
and long skip connections (reference: models/estimator.py:8-137)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stabletts_tpu.nn.blocks import DiTConVBlock, FiLMLayer, TimestepEmbedding, sinusoidal_pos_emb


class DitWrapper(nn.Module):
    """FiLM(t) then DiTConVBlock(speaker c) (reference: models/estimator.py:8-18)."""

    hidden_channels: int
    filter_channels: int
    num_heads: int
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 0
    time_channels: int = 0

    @nn.compact
    def __call__(self, x, c, t, mask, deterministic: bool = True):
        x = FiLMLayer(self.hidden_channels, name="time_fusion")(x, t) * mask[..., None]
        return DiTConVBlock(
            self.hidden_channels,
            self.filter_channels,
            self.num_heads,
            self.kernel_size,
            self.p_dropout,
            self.gin_channels,
            name="block",
        )(x, c, mask, deterministic)


class Decoder(nn.Module):
    """Velocity network v(t, x | mu, c) (reference: models/estimator.py:64-137).

    Input layout: x/mu [B, T, C] channels-last, t [B], c [B, gin], mask [B, T].
    """

    noise_channels: int
    cond_channels: int
    hidden_channels: int
    out_channels: int
    filter_channels: int
    p_dropout: float = 0.1
    n_layers: int = 1
    n_heads: int = 4
    kernel_size: int = 3
    gin_channels: int = 0
    use_lsc: bool = True

    @nn.compact
    def __call__(self, t, x, mask, mu, c, deterministic: bool = True):
        t_emb = sinusoidal_pos_emb(t, self.hidden_channels, scale=1000.0)
        t_emb = TimestepEmbedding(self.hidden_channels, self.filter_channels, name="time_mlp")(t_emb)

        # prenet on the aligned encoder output (3x conv+SiLU, estimator.py:83-89)
        h_mu = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="cond_proj_0")(mu)
        h_mu = nn.silu(h_mu)
        h_mu = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME", name="cond_proj_2")(h_mu)
        h_mu = nn.silu(h_mu)
        h_mu = nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME", name="cond_proj_4")(h_mu)

        h = jnp.concatenate([x, h_mu], axis=-1)  # (noise, mu) channel order
        h = nn.Dense(self.hidden_channels, name="in_proj")(h)

        n_lsc = self.n_layers // 2 if self.use_lsc else 0
        lsc_stack = []
        for idx in range(self.n_layers):
            if self.use_lsc:
                if idx < n_lsc:
                    lsc_stack.append(h)
                else:
                    skip = lsc_stack.pop()  # LIFO: U-Net pairing
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = nn.Conv(
                        self.hidden_channels,
                        (self.kernel_size,),
                        padding="SAME",
                        name=f"lsc_{idx - n_lsc}",
                    )(h)
            h = DitWrapper(
                self.hidden_channels,
                self.filter_channels,
                self.n_heads,
                self.kernel_size,
                self.p_dropout,
                self.gin_channels,
                self.hidden_channels,
                name=f"blocks_{idx}",
            )(h, c, t_emb, mask, deterministic)

        m = mask[..., None]
        out = nn.Dense(self.out_channels, name="final_proj")(h * m)
        return out * m
