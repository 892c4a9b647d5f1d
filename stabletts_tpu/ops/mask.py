"""Masking utilities (reference: utils/mask.py:4-8).

All sequence tensors in this framework are channels-last [B, T, C]; masks are
[B, T] float/bool and broadcast as [..., T, 1] against channel dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B] lengths -> [B, max_length] mask, 1.0 for valid positions.

    Matches reference utils/mask.py:4-8 (arange < length), but requires a static
    `max_length` so the result shape is knowable under jit.
    """
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return (pos[None, :] < lengths[:, None]).astype(dtype)


def attn_bias_from_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """[B, T] validity mask -> additive [B, 1, T, T] attention bias.

    Valid (i, j) pairs get 0, invalid get -finfo(dtype).max, matching the
    reference's additive mask construction (models/diffusion_transformer.py:107-108).
    """
    pair = mask[:, None, :, None] * mask[:, None, None, :]  # [B, 1, T, T]
    neg = jnp.asarray(-jnp.finfo(dtype).max, dtype=dtype)
    return jnp.where(pair > 0, jnp.zeros((), dtype=dtype), neg)
