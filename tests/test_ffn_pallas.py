"""Fused DiT-FFN kernel (ops/ffn_pallas.py) vs a flax/XLA oracle of the
reference's FFN half (diffusion_transformer.py:10-30,116-121)."""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from stabletts_tpu.ops.ffn_pallas import fused_adaln_ffn


def _oracle(x, shift, scale, gate, mask, w1, b1, w2, b2):
    b, t, c = x.shape
    m = mask[..., None]
    ln = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    h = ln.apply({}, x)
    h = h * (1 + scale[:, None, :]) + shift[:, None, :]

    def conv(h, w, bias):
        y = jax.lax.conv_general_dilated(
            h, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC")
        )
        return y + bias

    y = nn.silu(conv(h * m, w1, b1))
    z = conv(y * m, w2, b2) * m
    return x + gate[:, None, :] * z


def test_fused_ffn_matches_oracle():
    B, T, C, F = 2, 64, 32, 96
    ks = [jax.random.PRNGKey(i) for i in range(9)]
    mask = (jnp.arange(T)[None] < jnp.asarray([T, 40])[:, None]).astype(jnp.float32)
    x = jax.random.normal(ks[0], (B, T, C)) * mask[..., None]
    shift = jax.random.normal(ks[1], (B, C)) * 0.1
    scale = jax.random.normal(ks[2], (B, C)) * 0.1
    gate = jax.random.normal(ks[3], (B, C)) * 0.5
    w1 = jax.random.normal(ks[4], (3, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (F,)) * 0.1
    w2 = jax.random.normal(ks[6], (3, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (C,)) * 0.1

    want = _oracle(x, shift, scale, gate, mask, w1, b1, w2, b2)
    got = fused_adaln_ffn(x, shift, scale, gate, mask, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_dit_block_fused_env_flag(monkeypatch):
    """With STABLETTS_FFN_IMPL=fused / STABLETTS_DIT_FUSED=1 set on a non-TPU
    platform, the dispatch guard must reject the fused kernels (they have no
    interpret fallback in the block) and produce the identical XLA result —
    i.e. a CPU run with the env vars exported must not crash."""
    from stabletts_tpu.nn.blocks import DiTConVBlock

    blk = DiTConVBlock(hidden_channels=32, filter_channels=64, num_heads=2, gin_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    mask = jnp.ones((2, 24))
    v = blk.init(jax.random.PRNGKey(2), x, c, mask)
    base = blk.apply(v, x, c, mask, True)
    # env vars ACTIVE during apply: the platform gate (not the env var) must
    # keep CPU on the XLA path
    monkeypatch.setenv("STABLETTS_FFN_IMPL", "fused")
    monkeypatch.setenv("STABLETTS_DIT_FUSED", "1")
    again = blk.apply(v, x, c, mask, True)
    np.testing.assert_allclose(np.asarray(base), np.asarray(again), atol=0)


def test_train_attention_p_dropout_zero_is_differentiable():
    """Training (deterministic=False) with p_dropout=0.0 must take a
    differentiable attention path — the inference Pallas kernel has no VJP."""
    from stabletts_tpu.nn.blocks import DiTConVBlock

    blk = DiTConVBlock(
        hidden_channels=32, filter_channels=64, num_heads=2, gin_channels=16,
        p_dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    mask = jnp.ones((2, 24))
    v = blk.init(jax.random.PRNGKey(2), x, c, mask)

    def loss(params):
        out = blk.apply(
            {"params": params}, x, c, mask, False,
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(bool(jnp.isfinite(t).all()) for t in jax.tree_util.tree_leaves(g))
