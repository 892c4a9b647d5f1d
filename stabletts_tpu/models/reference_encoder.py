"""Mel reference (style) encoder for zero-shot timbre cloning
(reference: models/reference_encoder.py:4-92)."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class Conv1dGLU(nn.Module):
    """Conv1d + gated linear unit with residual connection
    (reference: models/reference_encoder.py:4-22)."""

    out_channels: int
    kernel_size: int
    dropout: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        residual = x
        h = nn.Conv(2 * self.out_channels, (self.kernel_size,), padding="SAME", name="conv1")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        h = x1 * jax.nn.sigmoid(x2)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return residual + h


class SelfAttention(nn.Module):
    """Standard MHA equivalent to torch.nn.MultiheadAttention(batch_first=True)
    with key_padding_mask, as used in MelStyleEncoder (reference_encoder.py:59-64).

    Parameters are stored unpacked (q/k/v/out) — the checkpoint converter splits
    torch's packed in_proj_weight.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        b, t, _ = x.shape
        head_dim = self.embed_dim // self.num_heads
        q = nn.Dense(self.embed_dim, name="q_proj")(x).reshape(b, t, self.num_heads, head_dim)
        k = nn.Dense(self.embed_dim, name="k_proj")(x).reshape(b, t, self.num_heads, head_dim)
        v = nn.Dense(self.embed_dim, name="v_proj")(x).reshape(b, t, self.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
        if key_padding_mask is not None:
            # True = pad -> excluded from attention
            neg = jnp.asarray(-jnp.finfo(logits.dtype).max, logits.dtype)
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, t, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class AttnMelStyleEncoder(nn.Module):
    """Attention-pool variant of MelStyleEncoder: a masked-mean query token is
    prepended and its attention output becomes the style vector
    (reference: models/reference_encoder.py:95-168 — dead code in the
    reference, provided for completeness)."""

    n_mel_channels: int = 80
    style_hidden: int = 128
    style_vector_dim: int = 256
    style_kernel_size: int = 5
    style_head: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        x = nn.Dense(self.style_hidden, name="spectral_0")(x)
        x = mish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.style_hidden, name="spectral_3")(x)
        x = mish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout, name="temporal_0")(
            x, deterministic
        )
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout, name="temporal_1")(
            x, deterministic
        )
        if mask is None:
            avg = jnp.mean(x, axis=1, keepdims=True)
            key_padding_mask = None
        else:
            m = mask[..., None]
            avg = (jnp.sum(x * m, axis=1) / jnp.sum(m, axis=1))[:, None, :]
            # the prepended pooled token is always attendable
            key_padding_mask = jnp.concatenate(
                [jnp.zeros((x.shape[0], 1), bool), mask <= 0], axis=1
            )
        x = jnp.concatenate([avg, x], axis=1)
        x = SelfAttention(self.style_hidden, self.style_head, self.dropout, name="slf_attn")(
            x, key_padding_mask, deterministic
        )
        return nn.Dense(self.style_vector_dim, name="fc")(x[:, 0, :])


class MelStyleEncoder(nn.Module):
    """Mel [B, T, n_mels] -> style vector [B, style_vector_dim]
    (reference: models/reference_encoder.py:25-92)."""

    n_mel_channels: int = 80
    style_hidden: int = 128
    style_vector_dim: int = 256
    style_kernel_size: int = 5
    style_head: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        """mask: [B, T] validity mask (1 = valid) or None."""
        # spectral: 2x (Linear + Mish + Dropout)
        x = nn.Dense(self.style_hidden, name="spectral_0")(x)
        x = mish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.style_hidden, name="spectral_3")(x)
        x = mish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        # temporal: 2x Conv1dGLU
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout, name="temporal_0")(
            x, deterministic
        )
        x = Conv1dGLU(self.style_hidden, self.style_kernel_size, self.dropout, name="temporal_1")(
            x, deterministic
        )
        # self-attention with key padding mask (True = pad)
        key_padding_mask = None if mask is None else (mask <= 0)
        x = SelfAttention(self.style_hidden, self.style_head, self.dropout, name="slf_attn")(
            x, key_padding_mask, deterministic
        )
        x = nn.Dense(self.style_vector_dim, name="fc")(x)
        # masked temporal mean-pool
        if mask is None:
            return jnp.mean(x, axis=1)
        m = mask[..., None]
        return jnp.sum(x * m, axis=1) / jnp.sum(m, axis=1)
