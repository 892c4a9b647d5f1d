"""Model package: StableTTS acoustic model, vocoders, sampler."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stabletts_tpu.config import MelConfig, ModelConfig
from stabletts_tpu.models.stabletts import StableTTS


def build_stabletts(model_cfg: ModelConfig | None = None, mel_cfg: MelConfig | None = None,
                    n_vocab: int | None = None) -> StableTTS:
    """Construct a StableTTS module from configs (reference: train.py:49)."""
    from stabletts_tpu.text import symbols

    model_cfg = model_cfg or ModelConfig()
    mel_cfg = mel_cfg or MelConfig()
    return StableTTS(
        n_vocab=n_vocab or len(symbols),
        mel_channels=mel_cfg.n_mels,
        hidden_channels=model_cfg.hidden_channels,
        filter_channels=model_cfg.filter_channels,
        n_heads=model_cfg.n_heads,
        n_enc_layers=model_cfg.n_enc_layers,
        n_dec_layers=model_cfg.n_dec_layers,
        kernel_size=model_cfg.kernel_size,
        p_dropout=model_cfg.p_dropout,
        gin_channels=model_cfg.gin_channels,
        remat=model_cfg.remat,
    )


def init_stabletts_params(model: StableTTS, rng: jax.Array, mel_channels: int | None = None) -> dict:
    """Initialize ALL params (every submodule) via the training forward pass
    on tiny dummy shapes. Returns the `variables` dict."""
    mel_channels = mel_channels or model.mel_channels
    b, tx, ty = 1, 5, 16
    x = jnp.zeros((b, tx), dtype=jnp.int32)
    xl = jnp.full((b,), tx, dtype=jnp.int32)
    y = jnp.zeros((b, ty, mel_channels))
    yl = jnp.full((b,), ty, dtype=jnp.int32)
    z = jnp.zeros((b, 8, mel_channels))
    zl = jnp.full((b,), 8, dtype=jnp.int32)
    return model.init(
        {"params": rng, "cfg": rng, "time": rng, "noise": rng, "dropout": rng},
        x, xl, y, yl, z, zl, True,
    )
