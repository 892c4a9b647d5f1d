"""Differentiable fused attention (ops/attention_pallas_train.py).

Interpret mode on CPU covers the rate=0 forward and exact gradients vs the
einsum oracle; the dropout path (on-core PRNG) only exists on real TPU, where
the kernel-level checks were run manually:
  * same-seed determinism of the dropped output,
  * forward/backward keep-mask agreement per head (pd extraction via
    identity-V / one-hot-dO probes: 0/64 disagreements on every head),
  * w^T J u via forward differencing == via VJP to f32-MXU precision.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabletts_tpu.ops.attention_pallas_train import fused_attention_train

B, T, H, D = 2, 200, 4, 64
C = H * D


def _inputs():
    q = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))
    k = jax.random.normal(jax.random.PRNGKey(2), (B, T, C))
    v = jax.random.normal(jax.random.PRNGKey(3), (B, T, C))
    lengths = np.array([T, 130])
    mask = (jnp.arange(T)[None] < jnp.asarray(lengths)[:, None]).astype(jnp.float32)
    return q, k, v, mask


def _ref_attn(q, k, v, mask):
    qh, kh, vh = (x.reshape(B, T, H, D) for x in (q, k, v))
    bias = jnp.where(mask > 0, 0.0, -1e30)[:, None, None, :]
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(D) + bias
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, T, C)


def test_forward_rate0_matches_einsum():
    q, k, v, mask = _inputs()
    ref = _ref_attn(q, k, v, mask) * mask[:, :, None]
    out = fused_attention_train(q, k, v, mask, 0.0, None, blk_q=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out * mask[:, :, None]), np.asarray(ref), atol=2e-5
    )


def test_gradients_rate0_match_einsum():
    q, k, v, mask = _inputs()

    def loss_fused(q_, k_, v_):
        o = fused_attention_train(q_, k_, v_, mask, 0.0, None, blk_q=128, interpret=True)
        return jnp.sum(o**2 * mask[:, :, None])

    def loss_ref(q_, k_, v_):
        return jnp.sum(_ref_attn(q_, k_, v_, mask) ** 2 * mask[:, :, None])

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name)


def test_dropout_requires_rng():
    q, k, v, mask = _inputs()
    with pytest.raises(AssertionError):
        fused_attention_train(q, k, v, mask, 0.1, None, blk_q=128, interpret=True)


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="on-core PRNG (prng_seed) has no interpret-mode lowering on CPU "
    "(verified NotImplementedError); covered on hardware by "
    "tools/tpu_selftest.py, which bench.py runs as a gate every bench",
)
def test_dropout_on_tpu():
    q, k, v, mask = _inputs()
    rng = jax.random.PRNGKey(7)
    f = jax.jit(lambda q_: fused_attention_train(q_, k, v, mask, 0.1, rng, blk_q=128))
    o1, o2 = np.asarray(f(q)), np.asarray(f(q))
    assert (o1 == o2).all(), "same seed must give same dropout pattern"
    nodrop = np.asarray(fused_attention_train(q, k, v, mask, 0.0, None, blk_q=128))
    assert np.abs(o1 - nodrop).max() > 1e-3, "dropout must change the output"
    # w^T J u agreement between forward differencing and the custom VJP
    u = jax.random.normal(jax.random.PRNGKey(9), v.shape)
    w = jax.random.normal(jax.random.PRNGKey(11), v.shape)
    fv = jax.jit(lambda v_: fused_attention_train(q, k, v_, mask, 0.1, rng, blk_q=128))
    dout = np.asarray(fv(v + u), np.float64) - np.asarray(fv(v), np.float64)
    _, vjp = jax.vjp(lambda v_: fused_attention_train(q, k, v_, mask, 0.1, rng, blk_q=128), v)
    dv = np.asarray(vjp(w)[0], np.float64)
    lhs = float((dout * np.asarray(w, np.float64)).sum())
    rhs = float((dv * np.asarray(u, np.float64)).sum())
    assert abs(lhs - rhs) / max(abs(lhs), 1e-9) < 0.05


def test_nonmultiple_length_padding():
    q, k, v, mask = _inputs()  # T=200 pads to 256 at blk_q=128... already non-multiple
    out = fused_attention_train(q, k, v, mask, 0.0, None, blk_q=256, interpret=True)
    assert out.shape == (B, T, C)
    ref = _ref_attn(q, k, v, mask) * mask[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out * mask[:, :, None]), np.asarray(ref), atol=2e-5
    )
