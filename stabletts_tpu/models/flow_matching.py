"""Conditional flow matching (OT-CFM) decoder
(reference: models/flow_matching.py:11-100).

Sampling integrates dx/dt = v(t, x | mu, c) over t in [0, 1] with jit-stable
XLA solvers (ops/ode.py) instead of torchdiffeq; classifier-free guidance runs
the estimator twice per evaluation (cond + uncond) and mixes
uncond + s * (cond - uncond).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from stabletts_tpu.models.estimator import Decoder


class CFMDecoder(nn.Module):
    noise_channels: int
    cond_channels: int
    hidden_channels: int
    out_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    gin_channels: int
    sigma_min: float = 1e-4
    remat: bool = False

    def setup(self):
        self.estimator = Decoder(
            noise_channels=self.noise_channels,
            cond_channels=self.cond_channels,
            hidden_channels=self.hidden_channels,
            out_channels=self.out_channels,
            filter_channels=self.filter_channels,
            p_dropout=self.p_dropout,
            n_layers=self.n_layers,
            n_heads=self.n_heads,
            kernel_size=self.kernel_size,
            gin_channels=self.gin_channels,
            remat=self.remat,
        )

    def __call__(self, t, x, mask, mu, c, deterministic: bool = True, mu_is_precomputed: bool = False):
        """Velocity field evaluation v(t, x | mu, c) — the ODE integration
        itself lives outside the module (models/sampler.py) so `lax.scan`
        traces the estimator exactly once."""
        return self.estimator(t, x, mask, mu, c, deterministic, mu_is_precomputed)

    def compute_loss(self, x1, mask, mu, c, t_rand, noise, deterministic: bool = False):
        """OT-CFM loss with cosine timestep warp (reference: flow_matching.py:69-100).

        x1: target mel [B, T, C]; t_rand: U[0,1) [B]; noise: standard normal
        like x1. Loss = unmasked sum MSE / (sum(mask) * C) — the estimator
        output is already zero at padded positions, matching the reference's
        normalization exactly.
        """
        t = 1 - jnp.cos(t_rand * 0.5 * jnp.pi)  # [B]
        t3 = t[:, None, None]
        y = (1 - (1 - self.sigma_min) * t3) * noise + t3 * x1
        u = x1 - (1 - self.sigma_min) * noise
        # pad_t=128: run the block stack at a 128-multiple so the fused
        # attention kernels skip their per-block pad/slice (see Decoder)
        pred = self.estimator(t, y, mask, mu, c, deterministic, pad_t=128)
        # reductions in f32 (matters under bf16 mixed-precision training)
        sq = ((pred - u).astype(jnp.float32)) ** 2
        loss = jnp.sum(sq) / (jnp.sum(mask.astype(jnp.float32)) * u.shape[-1])
        return loss, y
