"""FireflyGAN vocoder (inference-only in the reference too): ConvNeXt encoder
backbone + HiFiGAN transposed-conv head (reference: vocoders/ffgan/
{model,backbone,head}.py). Weight norm is folded at checkpoint conversion, so
all convs here are plain.

Layout: mel [B, T, n_mels] channels-last -> waveform [B, T * hop_length].
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from stabletts_tpu.ops.conv import conv1d_dilated, conv_transpose_1d

FFGAN_CONFIG = {
    # reference: vocoders/ffgan/model.py:7-29 (hard-coded fishaudio config)
    "backbone": {
        "input_channels": 128,
        "depths": (3, 3, 9, 3),
        "dims": (128, 256, 384, 512),
        "drop_path_rate": 0.2,
        "kernel_size": 7,
    },
    "head": {
        "hop_length": 512,
        "upsample_rates": (8, 8, 2, 2, 2),
        "upsample_kernel_sizes": (16, 16, 4, 4, 4),
        "resblock_kernel_sizes": (3, 7, 11),
        "resblock_dilation_sizes": ((1, 3, 5), (1, 3, 5), (1, 3, 5)),
        "num_mels": 512,
        "upsample_initial_channel": 512,
        "pre_conv_kernel_size": 13,
        "post_conv_kernel_size": 13,
    },
}


def drop_path(x, rate: float, deterministic: bool, rng=None):
    """Stochastic depth (reference: vocoders/ffgan/backbone.py:7-31)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class FFConvNeXtBlock(nn.Module):
    """ConvNeXt block, fish-diffusion variant (reference: backbone.py:81-152):
    mlp_ratio=4, layer scale 1e-6, optional stochastic depth."""

    dim: int
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    mlp_ratio: float = 4.0
    kernel_size: int = 7
    dilation: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        pad = int(self.dilation * (self.kernel_size - 1) / 2)
        x = nn.Conv(
            self.dim, (self.kernel_size,),
            padding=pad, kernel_dilation=self.dilation,
            feature_group_count=self.dim, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm")(x)
        x = nn.Dense(int(self.mlp_ratio * self.dim), name="pwconv1")(x)
        x = nn.gelu(x, approximate=x.dtype == jnp.bfloat16)  # exact erf at f32; tanh at bf16 (below bf16 resolution, avoids slow erfc table kernel)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
            )
            x = gamma * x
        if not deterministic and self.drop_path_rate > 0:
            x = drop_path(x, self.drop_path_rate, deterministic, self.make_rng("droppath"))
        return residual + x


class ConvNeXtEncoder(nn.Module):
    """(reference: vocoders/ffgan/backbone.py:155-218)."""

    input_channels: int = 3
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dp_rates = jnp.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        cur = 0
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                x = nn.Conv(
                    dim, (self.kernel_size,), padding=self.kernel_size // 2,
                    name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name=f"mid_norm_{i}")(x)
                x = nn.Dense(dim, name=f"mid_conv_{i}")(x)
            for j in range(depth):
                x = FFConvNeXtBlock(
                    dim=dim,
                    drop_path_rate=float(dp_rates[cur + j]),
                    layer_scale_init_value=self.layer_scale_init_value,
                    kernel_size=self.kernel_size,
                    name=f"stages_{i}_{j}",
                )(x, deterministic)
            cur += depth
        return nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm")(x)


class ResBlock1(nn.Module):
    """HiFiGAN residual block with dilated conv pairs
    (reference: vocoders/ffgan/head.py:26-119)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for m, d in enumerate(self.dilation):
            xt = nn.silu(x)
            pad1 = (self.kernel_size * d - d) // 2
            k1 = self.param(
                "convs1_%d_kernel" % m, nn.initializers.normal(0.01),
                (self.kernel_size, self.channels, self.channels),
            )
            b1 = self.param("convs1_%d_bias" % m, nn.initializers.zeros, (self.channels,))
            xt = conv1d_dilated(xt, k1, d, pad1, b1)
            xt = nn.silu(xt)
            pad2 = (self.kernel_size - 1) // 2
            k2 = self.param(
                "convs2_%d_kernel" % m, nn.initializers.normal(0.01),
                (self.kernel_size, self.channels, self.channels),
            )
            b2 = self.param("convs2_%d_bias" % m, nn.initializers.zeros, (self.channels,))
            xt = conv1d_dilated(xt, k2, 1, pad2, b2)
            x = xt + x
        return x


class ParallelBlock(nn.Module):
    """Mean of parallel ResBlocks (reference: head.py:122-139; the reference
    spells it 'ParralelBlock')."""

    channels: int
    kernel_sizes: Sequence[int] = (3, 7, 11)
    dilation_sizes: Sequence[Tuple[int, ...]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @nn.compact
    def __call__(self, x):
        outs = [
            ResBlock1(self.channels, k, tuple(d), name=f"blocks_{i}")(x)
            for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilation_sizes))
        ]
        return jnp.mean(jnp.stack(outs, axis=0), axis=0)


class HiFiGANGenerator(nn.Module):
    """(reference: vocoders/ffgan/head.py:142-248, use_template=False path)."""

    hop_length: int = 512
    upsample_rates: Sequence[int] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 4, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Tuple[int, ...]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 128
    upsample_initial_channel: int = 512
    pre_conv_kernel_size: int = 7
    post_conv_kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.upsample_initial_channel, (self.pre_conv_kernel_size,),
            padding=(self.pre_conv_kernel_size - 1) // 2, name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.silu(x)
            kernel = self.param(
                f"ups_{i}_kernel", nn.initializers.normal(0.01),
                (k, x.shape[-1], ch),
            )
            bias = self.param(f"ups_{i}_bias", nn.initializers.zeros, (ch,))
            x = conv_transpose_1d(x, kernel, u, (k - u) // 2, bias)
            x = ParallelBlock(
                ch, self.resblock_kernel_sizes, self.resblock_dilation_sizes,
                name=f"resblocks_{i}",
            )(x)
        x = nn.silu(x)
        x = nn.Conv(
            1, (self.post_conv_kernel_size,),
            padding=(self.post_conv_kernel_size - 1) // 2, name="conv_post",
        )(x)
        return jnp.tanh(x)


class FireflyGANBase(nn.Module):
    """mel [B, T, 128] -> waveform [B, T * 512]
    (reference: vocoders/ffgan/model.py:44-57)."""

    @nn.compact
    def __call__(self, mel, deterministic: bool = True):
        h = ConvNeXtEncoder(**FFGAN_CONFIG["backbone"], name="backbone")(mel, deterministic)
        wav = HiFiGANGenerator(**FFGAN_CONFIG["head"], name="head")(h)
        return wav[..., 0]  # [B, T*hop, 1] -> [B, T*hop]
