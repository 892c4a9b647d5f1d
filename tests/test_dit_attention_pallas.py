"""Fused DiT attention-half kernel (ops/dit_attention_pallas.py) vs the
flax composition: LN -> modulate -> MHA(partial RoPE) -> gate -> residual."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from stabletts_tpu.nn.blocks import MultiHeadAttention
from stabletts_tpu.ops.dit_attention_pallas import fused_dit_attention


@pytest.mark.parametrize("t,heads", [(64, 2), (96, 4)])
def test_fused_dit_attention_matches_flax(t, heads):
    B, C = 2, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (B, t, C))
    mask = (jnp.arange(t)[None] < jnp.asarray([t, t - 17])[:, None]).astype(jnp.float32)
    x = x * mask[..., None]
    shift = jax.random.normal(jax.random.PRNGKey(1), (B, C)) * 0.1
    scale = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.1
    gate = jax.random.normal(jax.random.PRNGKey(3), (B, C)) * 0.5

    mha = MultiHeadAttention(C, C, heads, 0.0)
    v = mha.init(jax.random.PRNGKey(4), x, mask)
    p = v["params"]

    ln = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    h = ln.apply({}, x)
    h = h * (1 + scale[:, None, :]) + shift[:, None, :]
    ref = x + gate[:, None, :] * mha.apply(v, h, mask, True) * mask[..., None]

    got = fused_dit_attention(
        x, shift, scale, gate, mask,
        p["conv_q"]["kernel"], p["conv_q"]["bias"],
        p["conv_k"]["kernel"], p["conv_k"]["bias"],
        p["conv_v"]["kernel"], p["conv_v"]["bias"],
        p["conv_o"]["kernel"], p["conv_o"]["bias"],
        n_heads=heads, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)
