"""Whole-DiT-block fused kernel (ops/dit_block_pallas.py) vs the flax
composition of both halves: LN->mod->MHA(RoPE)->gate->residual then
LN->mod->convFFN->gate->residual."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabletts_tpu.nn.blocks import FFN, MultiHeadAttention, _modulate
from stabletts_tpu.ops.dit_block_pallas import fused_dit_block


@pytest.mark.parametrize("t,heads", [(64, 2), (96, 4)])
def test_fused_dit_block_matches_flax(t, heads):
    B, C, F = 2, 64, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (B, t, C))
    mask = (jnp.arange(t)[None] < jnp.asarray([t, t - 17])[:, None]).astype(jnp.float32)
    x = x * mask[..., None]
    mods = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (B, C)) * 0.1
        for i in range(6)
    ]

    mha = MultiHeadAttention(C, C, heads, 0.0)
    va = mha.init(jax.random.PRNGKey(4), x, mask)
    pa = va["params"]
    ffn = FFN(C, F, 3, 0.0)
    vf = ffn.init(jax.random.PRNGKey(5), x, mask)
    pf = vf["params"]

    ln = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    m = mask[..., None]
    h = _modulate(ln.apply({}, x), mods[0][:, None, :], mods[1][:, None, :])
    x1 = x + mods[2][:, None, :] * mha.apply(va, h, mask, True) * m
    h2 = _modulate(ln.apply({}, x1), mods[3][:, None, :], mods[4][:, None, :])
    ref = x1 + mods[5][:, None, :] * ffn.apply(vf, h2, mask, True) * m

    got = fused_dit_block(
        x, tuple(mods), mask,
        pa["conv_q"]["kernel"], pa["conv_q"]["bias"],
        pa["conv_k"]["kernel"], pa["conv_k"]["bias"],
        pa["conv_v"]["kernel"], pa["conv_v"]["bias"],
        pa["conv_o"]["kernel"], pa["conv_o"]["bias"],
        pf["conv_1"]["kernel"], pf["conv_1"]["bias"],
        pf["conv_2"]["kernel"], pf["conv_2"]["bias"],
        n_heads=heads, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
