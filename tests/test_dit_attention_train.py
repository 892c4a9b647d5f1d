"""Differentiable fused DiT attention-half kernel
(ops/dit_attention_pallas_train.py) vs an XLA oracle of the training path:
forward and ALL gradients (x, shift/scale/gate, q/k/v/o projections) at
dropout 0."""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.nn.blocks import apply_rope
from stabletts_tpu.ops.dit_attention_pallas_train import fused_dit_attention_train
from stabletts_tpu.ops.mask import attn_bias_from_mask


def _oracle(x, shift, scale, gate, mask, wq, bq, wk, bk, wv, bv, wo, bo,
            n_heads):
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    ln = nn.LayerNorm(use_scale=False, use_bias=False, epsilon=1e-5)
    h = ln.apply({}, x)
    h = h * (1 + scale[:, None, :]) + shift[:, None, :]
    q = (h @ wq + bq).reshape(b, t, n_heads, head_dim)
    k = (h @ wk + bk).reshape(b, t, n_heads, head_dim)
    v = (h @ wv + bv).reshape(b, t, n_heads, head_dim)
    q = apply_rope(q, rotary_dim)
    k = apply_rope(k, rotary_dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
    logits = logits + attn_bias_from_mask(mask, dtype=logits.dtype)
    att = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(logits, axis=-1), v)
    out = att.reshape(b, t, c) @ wo + bo
    return x + gate[:, None, :] * out * mask[..., None]


def _inputs(B=2, T=64, C=128, H=4):
    ks = [jax.random.PRNGKey(i) for i in range(12)]
    mask = (jnp.arange(T)[None] < jnp.asarray([T, T - 24])[:, None]).astype(
        jnp.float32
    )
    x = jax.random.normal(ks[0], (B, T, C)) * mask[..., None]
    shift = jax.random.normal(ks[1], (B, C)) * 0.1
    scale = jax.random.normal(ks[2], (B, C)) * 0.1
    gate = jax.random.normal(ks[3], (B, C)) * 0.5
    ws = [jax.random.normal(ks[4 + i], (C, C)) * (1.0 / C ** 0.5) for i in range(4)]
    bs = [jax.random.normal(ks[8 + i], (C,)) * 0.05 for i in range(4)]
    return (x, shift, scale, gate, mask,
            ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3])


def test_fwd_matches_oracle():
    args = _inputs()
    got = fused_dit_attention_train(*args, n_heads=4, interpret=True)
    want = _oracle(*args, n_heads=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_grads_match_oracle():
    args = _inputs()
    mask = args[4]
    cot = jax.random.normal(jax.random.PRNGKey(42), args[0].shape)
    diff_idx = (0, 1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12)  # all but mask

    def loss_fused(*diff):
        full = list(args)
        for i, v in zip(diff_idx, diff):
            full[i] = v
        out = fused_dit_attention_train(*full, n_heads=4, interpret=True)
        return jnp.sum(out * cot)

    def loss_oracle(*diff):
        full = list(args)
        for i, v in zip(diff_idx, diff):
            full[i] = v
        return jnp.sum(_oracle(*full, n_heads=4) * cot)

    diff_args = tuple(args[i] for i in diff_idx)
    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(diff_args))))(*diff_args)
    g_oracle = jax.grad(loss_oracle, argnums=tuple(range(len(diff_args))))(*diff_args)
    names = ["dx", "dshift", "dscale", "dgate", "dwq", "dbq", "dwk", "dbk",
             "dwv", "dbv", "dwo", "dbo"]
    for name, a, b in zip(names, g_fused, g_oracle):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4, err_msg=name,
        )
