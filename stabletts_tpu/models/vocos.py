"""Vocos vocoder: ConvNeXt backbone + ISTFT head, mel -> waveform in one
forward pass (reference: vocoders/vocos/models/{model,backbone,module,head}.py).

Layout: mel input is channels-last [B, T, n_mels]; output waveform [B, T*hop].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from stabletts_tpu.config import MelConfig, VocosConfig
from stabletts_tpu.ops.istft import istft_same_real


def _gelu(x):
    """Exact-erf GELU at f32 (parity with torch nn.GELU()); tanh variant at
    bf16, where the ~3e-3 max deviation is below bf16 resolution and the
    exact erfc lowers to a slow table-based VPU kernel on TPU."""
    return nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


class ConvNeXtBlock(nn.Module):
    """1D ConvNeXt block: depthwise conv k=7 -> LN -> pointwise MLP with GELU
    -> layer scale -> residual (reference: vocoders/vocos/models/module.py:5-46)."""

    dim: int
    intermediate_dim: int
    layer_scale_init_value: float

    @nn.compact
    def __call__(self, x):
        residual = x
        x = nn.Conv(self.dim, (7,), padding="SAME", feature_group_count=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = _gelu(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,),
            )
            x = gamma * x
        return residual + x


class VocosBackbone(nn.Module):
    """(reference: vocoders/vocos/models/backbone.py:8-57)."""

    input_channels: int
    dim: int
    intermediate_dim: int
    num_layers: int
    layer_scale_init_value: float | None = None

    @nn.compact
    def __call__(self, x, rowmask=None):
        """rowmask [B, T, 1] (1 = valid): re-zeroes activations after every
        block so each SAME conv sees the zero padding the trimmed input would
        produce — the fixed-shape serving mode's exactness invariant."""
        scale = self.layer_scale_init_value or 1.0 / self.num_layers
        x = nn.Conv(self.dim, (7,), padding="SAME", name="embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="norm")(x)
        if rowmask is not None:
            x = x * rowmask
        for i in range(self.num_layers):
            x = ConvNeXtBlock(self.dim, self.intermediate_dim, scale, name=f"convnext_{i}")(x)
            if rowmask is not None:
                x = x * rowmask
        return nn.LayerNorm(epsilon=1e-6, dtype=x.dtype, name="final_layer_norm")(x)


class ISTFTHead(nn.Module):
    """Linear -> (log-mag, phase) -> complex spectrogram -> ISTFT
    (reference: vocoders/vocos/models/head.py:75-118)."""

    dim: int
    n_fft: int
    hop_length: int
    # inference-only flag set by vocos_apply_fused: the fused Pallas ISTFT
    # has no VJP, so the default (training-safe) path must stay XLA — GAN
    # training differentiates through this head
    fused_istft: bool = False

    @nn.compact
    def __call__(self, x, frame_mask=None):
        import os

        in_dtype = x.dtype
        x = nn.Dense(self.n_fft + 2, name="out")(x)  # [B, T, n_fft + 2]
        mag, p = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        mag = jnp.exp(mag)
        mag = jnp.clip(mag, max=1e2)
        # complex spectrum kept as (re, im): the iDFT runs as an MXU matmul —
        # no complex dtype, no TPU FFT. exp/cos/sin stay f32; in bf16 mode
        # only the iDFT matmul inputs are quantized.
        re_s, im_s = mag * jnp.cos(p), mag * jnp.sin(p)
        matmul_dtype = in_dtype if in_dtype != jnp.float32 else None

        # TPU: the fused Pallas kernel keeps the [B, T, n_fft] frames in VMEM
        # (one matmul + OLA + envelope per grid cell); the XLA path pays the
        # frames' HBM round-trip and an OLA chain ~8x off bandwidth.
        # Override via STABLETTS_ISTFT_IMPL={xla,fused}.
        impl = os.environ.get("STABLETTS_ISTFT_IMPL", "auto")
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        use_fused = (
            platform == "tpu"  # no interpret fallback in this dispatch
            and self.n_fft % self.hop_length == 0
            and frame_mask is None  # fused kernel bakes a static envelope
            and (impl == "fused" or (impl == "auto" and self.fused_istft))
        )
        if use_fused:
            # _diff variant: fused Pallas forward + XLA-transpose backward, so
            # selecting fused (flag or STABLETTS_ISTFT_IMPL=fused) stays safe
            # under jax.grad (GAN training differentiates through the head)
            from stabletts_tpu.ops.istft_pallas import istft_same_fused_diff

            return istft_same_fused_diff(
                re_s, im_s, self.n_fft, self.hop_length, self.n_fft,
                matmul_dtype,
            )
        return istft_same_real(
            re_s, im_s, self.n_fft, self.hop_length, self.n_fft,
            matmul_dtype=matmul_dtype, frame_mask=frame_mask,
        )


class Vocos(nn.Module):
    """(reference: vocoders/vocos/models/model.py:11-20)."""

    vocos_config: VocosConfig
    mel_config: MelConfig

    @nn.compact
    def __call__(self, mel, lengths=None):
        """mel: [B, T, n_mels] log-mel -> waveform [B, T * hop_length].

        lengths [B] (optional): fixed-shape serving mode. Frames >= lengths[i]
        are treated as nonexistent: the input is zeroed there, activations are
        re-zeroed after every conv block (so each SAME conv sees exactly the
        zero padding it would see on the trimmed input), and the ISTFT head
        masks spectra + computes a per-item window envelope. Output matches
        vocoding the trimmed mel (then zero-padding the waveform) while one
        compiled shape serves every length — no per-length recompile."""
        rowmask = None
        if lengths is not None:
            t = mel.shape[1]
            rowmask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(mel.dtype)[..., None]
            mel = mel * rowmask
        x = VocosBackbone(
            input_channels=self.vocos_config.input_channels,
            dim=self.vocos_config.dim,
            intermediate_dim=self.vocos_config.intermediate_dim,
            num_layers=self.vocos_config.num_layers,
            name="backbone",
        )(mel, rowmask)
        return ISTFTHead(
            self.vocos_config.dim, self.mel_config.n_fft, self.mel_config.hop_length, name="head"
        )(x, None if rowmask is None else rowmask[..., 0])


def vocos_apply_fused(model: Vocos, variables, mel, interpret: bool = False,
                      lengths=None):
    """Inference-only Vocos forward with each ConvNeXt block as one fused
    Pallas kernel (ops/convnext_pallas.py). Same numerics as model.apply up
    to the GELU variant already used at the activations' dtype; embed conv,
    the outer LayerNorms, and the ISTFT head reuse the flax submodules
    functionally, so every parameter is consumed from the same tree.

    XLA lowers the k=7 depthwise conv to reshape/copy/reduce chains (~2.9 ms
    per forward at [32, 1000, 512] on v5e); the fused kernel runs it as 7
    shifted VPU FMAs on the resident tile. The ISTFT head also takes its
    fused kernel here (iDFT matmul + overlap-add + envelope in one VMEM pass,
    7.2 -> 4.6 ms at [32, 1000] bf16). Not differentiable — GAN training
    uses model.apply, whose head stays on the XLA ISTFT.
    """
    from stabletts_tpu.ops.convnext_pallas import fused_convnext_block

    cfg, mel_cfg = model.vocos_config, model.mel_config
    p = variables["params"]
    pb = p["backbone"]

    t = mel.shape[1]
    frame_mask = None
    if lengths is not None:
        # fixed-shape serving mode: same masking invariant as Vocos.__call__
        frame_mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(mel.dtype)
        mel = mel * frame_mask[..., None]

    embed = nn.Conv(cfg.dim, (7,), padding="SAME")
    x = embed.apply({"params": pb["embed"]}, mel)
    ln = nn.LayerNorm(epsilon=1e-6, dtype=x.dtype)
    x = ln.apply({"params": pb["norm"]}, x)

    pad = (-t) % 8  # kernel wants sublane-aligned rows
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    if pad or lengths is not None:
        # keep invalid rows zero between blocks so each dwconv sees exactly
        # the SAME zero padding the trimmed input would produce
        valid = lengths[:, None] if lengths is not None else jnp.asarray([t])[:, None]
        rowmask = (jnp.arange(t + pad)[None, :] < valid).astype(x.dtype)[..., None]
        x = x * rowmask
    for i in range(cfg.num_layers):
        q = pb[f"convnext_{i}"]
        x = fused_convnext_block(
            x,
            q["dwconv"]["kernel"][:, 0, :], q["dwconv"]["bias"],
            q["norm"]["scale"], q["norm"]["bias"],
            q["pwconv1"]["kernel"], q["pwconv1"]["bias"],
            q["pwconv2"]["kernel"], q["pwconv2"]["bias"],
            q["gamma"],
            interpret=interpret,
        )
        if pad or lengths is not None:
            x = x * rowmask
    if pad:
        x = x[:, :t]
    x = ln.apply({"params": pb["final_layer_norm"]}, x)

    head = ISTFTHead(cfg.dim, mel_cfg.n_fft, mel_cfg.hop_length,
                     fused_istft=frame_mask is None)
    return head.apply({"params": p["head"]}, x, frame_mask)
