"""Flow-matching velocity estimator: DiT U-Net with FiLM timestep conditioning
and long skip connections (reference: models/estimator.py:8-137)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stabletts_tpu.nn.blocks import (
    DiTConVBlock,
    FiLMLayer,
    TimestepEmbedding,
    _ConvParams,
    _conv1d_same,
    sinusoidal_pos_emb,
)


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
        x = FiLMLayer(self.hidden_channels, name="time_fusion")(x, t) * mask.astype(x.dtype)[..., None]
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

    The mu prenet (`cond_proj`) is t-independent; `precompute_mu` exposes it
    separately so the ODE sampler computes it ONCE per synthesis instead of
    once per estimator evaluation (the reference recomputes it every
    torchdiffeq call — ~18% of estimator FLOPs at 10 steps).
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
    # rematerialize each DiT block in backward (training memory knob; see
    # ModelConfig.remat). Param tree is unchanged, so checkpoints stay
    # compatible either way.
    remat: bool = False

    def setup(self):
        if self.use_lsc and self.n_layers % 2 != 0:
            # reference models/estimator.py asserts n_layers % 2 == 0; without
            # it the LSC stack pops more than it pushes and dies mid-trace
            raise ValueError(
                f"n_layers must be even when use_lsc=True (got {self.n_layers})"
            )
        self.time_mlp = TimestepEmbedding(self.hidden_channels, self.filter_channels)
        # bare conv params (nn.Conv-identical tree) so precompute_mu can
        # route them through either lax.conv or the fused training kernel
        self.cond_proj_0 = _ConvParams(
            (self.kernel_size, self.cond_channels, self.filter_channels)
        )
        self.cond_proj_2 = _ConvParams(
            (self.kernel_size, self.filter_channels, self.filter_channels)
        )
        self.cond_proj_4 = _ConvParams(
            (self.kernel_size, self.filter_channels, self.hidden_channels)
        )
        self.in_proj = nn.Dense(self.hidden_channels)
        self.final_proj = nn.Dense(self.out_channels)
        n_lsc = self.n_layers // 2 if self.use_lsc else 0
        # list attributes are auto-named lsc_0..., blocks_0... by linen
        self.lsc = [
            nn.Conv(self.hidden_channels, (self.kernel_size,), padding="SAME")
            for _ in range(n_lsc)
        ]
        # static_argnums counts self at 0: deterministic is __call__ arg 5
        block_cls = nn.remat(DitWrapper, static_argnums=(5,)) if self.remat else DitWrapper
        self.blocks = [
            block_cls(
                self.hidden_channels,
                self.filter_channels,
                self.n_heads,
                self.kernel_size,
                self.p_dropout,
                self.gin_channels,
                self.hidden_channels,
            )
            for _ in range(self.n_layers)
        ]

    def precompute_mu(self, mu, deterministic: bool = True):
        """3x conv + SiLU prenet on the aligned encoder output
        (reference: estimator.py:83-89). Training on TPU runs the whole
        chain as one custom-VJP Pallas kernel (ops/prenet_pallas_train.py)
        when STABLETTS_PRENET_TRAIN=fused — after round 5 fused the DiT
        halves, the prenet's [3,1024,1024] conv grads were the largest
        XLA-side item left in the step profile, but the fused kernel
        MEASURED SLOWER (67.5 vs 65.1 ms fp32, 65.6 vs 61.6 bf16): with
        width-1024 channels XLA's batched [B*T,1024]x[1024,1024] conv
        matmuls already run near peak, and the per-batch-element grid
        serialization costs more than the removed layout fusions. Kept as
        an opt-in documented negative (DESIGN.md)."""
        import os

        wa, ba = self.cond_proj_0()
        wb, bb = self.cond_proj_2()
        wc, bc = self.cond_proj_4()
        if (
            not deterministic
            and os.environ.get("STABLETTS_PRENET_TRAIN", "xla") == "fused"
            and jax.devices()[0].platform == "tpu"
            and mu.shape[1] % 8 == 0
            and self.kernel_size == 3
            and not self.is_initializing()
        ):
            from stabletts_tpu.ops.prenet_pallas_train import fused_prenet_train

            return fused_prenet_train(mu, wa, ba, wb, bb, wc, bc)
        h = nn.silu(_conv1d_same(mu, wa, ba))
        h = nn.silu(_conv1d_same(h, wb, bb))
        return _conv1d_same(h, wc, bc)

    def __call__(self, t, x, mask, mu, c, deterministic: bool = True, mu_is_precomputed: bool = False,
                 pad_t: int = 0):
        """pad_t > 0 pads the time axis to the next multiple of pad_t for the
        block stack (training: pad_t=128 lets the fused attention kernels run
        without a per-block pad/slice pair — ~12 pads + 12 slices per step at
        T=1000 otherwise). Padding happens AFTER the mu prenet, whose convs
        are unmasked and would otherwise see a changed boundary; the block
        stack itself is exactly mask-invariant (every block masks its input
        and both residual contributions), so valid rows are unchanged and the
        output is sliced back to T."""
        t_emb = self.time_mlp(sinusoidal_pos_emb(t, self.hidden_channels, scale=1000.0))
        h_mu = mu if mu_is_precomputed else self.precompute_mu(mu, deterministic)

        t_len = x.shape[1]
        if pad_t:
            t_padded = -(-t_len // pad_t) * pad_t
            if t_padded != t_len:
                pad3 = ((0, 0), (0, t_padded - t_len), (0, 0))
                x = jnp.pad(x, pad3)
                h_mu = jnp.pad(h_mu, pad3)
                mask = jnp.pad(mask, ((0, 0), (0, t_padded - t_len)))

        h = jnp.concatenate([x, h_mu], axis=-1)  # (noise, mu) channel order
        h = self.in_proj(h)

        n_lsc = len(self.lsc)
        lsc_stack = []
        for idx, block in enumerate(self.blocks):
            if self.use_lsc:
                if idx < n_lsc:
                    lsc_stack.append(h)
                else:
                    skip = lsc_stack.pop()  # LIFO: U-Net pairing
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = self.lsc[idx - n_lsc](h)
            h = block(h, c, t_emb, mask, deterministic)

        m = mask.astype(h.dtype)[..., None]
        out = self.final_proj(h * m) * m
        return out[:, :t_len]
