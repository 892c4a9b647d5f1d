"""Differentiable fused FFN-half kernel (ops/ffn_pallas_train.py) vs the
XLA training path: forward AND all gradients (x, shift/scale/gate, conv
params) at dropout 0; dropout statistics at rate > 0."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

_tpu_only = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="on-core PRNG (prng_seed) has no interpret-mode lowering on CPU; "
    "covered on hardware by tools/tpu_selftest.py, which bench.py runs as "
    "a gate every bench",
)

from stabletts_tpu.ops.ffn_pallas_train import fused_adaln_ffn_train


def _oracle(x, shift, scale, gate, mask, w1, b1, w2, b2):
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


def _inputs(B=2, T=64, C=32, F=96):
    ks = [jax.random.PRNGKey(i) for i in range(9)]
    mask = (jnp.arange(T)[None] < jnp.asarray([T, T - 24])[:, None]).astype(
        jnp.float32
    )
    x = jax.random.normal(ks[0], (B, T, C)) * mask[..., None]
    shift = jax.random.normal(ks[1], (B, C)) * 0.1
    scale = jax.random.normal(ks[2], (B, C)) * 0.1
    gate = jax.random.normal(ks[3], (B, C)) * 0.5
    w1 = jax.random.normal(ks[4], (3, C, F)) * 0.1
    b1 = jax.random.normal(ks[5], (F,)) * 0.1
    w2 = jax.random.normal(ks[6], (3, F, C)) * 0.1
    b2 = jax.random.normal(ks[7], (C,)) * 0.1
    return x, shift, scale, gate, mask, w1, b1, w2, b2


def test_fwd_matches_oracle():
    args = _inputs()
    got = fused_adaln_ffn_train(*args, dropout_rate=0.0, interpret=True)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_oracle():
    x, shift, scale, gate, mask, w1, b1, w2, b2 = _inputs()
    cot = jax.random.normal(jax.random.PRNGKey(42), x.shape)

    def loss_fused(x, shift, scale, gate, w1, b1, w2, b2):
        out = fused_adaln_ffn_train(
            x, shift, scale, gate, mask, w1, b1, w2, b2,
            dropout_rate=0.0, interpret=True,
        )
        return jnp.sum(out * cot)

    def loss_oracle(x, shift, scale, gate, w1, b1, w2, b2):
        return jnp.sum(_oracle(x, shift, scale, gate, mask, w1, b1, w2, b2) * cot)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(
        x, shift, scale, gate, w1, b1, w2, b2
    )
    g_oracle = jax.grad(loss_oracle, argnums=tuple(range(8)))(
        x, shift, scale, gate, w1, b1, w2, b2
    )
    names = ["dx", "dshift", "dscale", "dgate", "dw1", "db1", "dw2", "db2"]
    for name, a, b in zip(names, g_fused, g_oracle):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=name,
        )


@_tpu_only
def test_dropout_statistics_and_determinism():
    x, shift, scale, gate, mask, w1, b1, w2, b2 = _inputs(B=2, T=64, C=128, F=256)
    rng = jax.random.PRNGKey(7)
    out1 = fused_adaln_ffn_train(
        x, shift, scale, gate, mask, w1, b1, w2, b2,
        dropout_rate=0.5, rng=rng,
    )
    out2 = fused_adaln_ffn_train(
        x, shift, scale, gate, mask, w1, b1, w2, b2,
        dropout_rate=0.5, rng=rng,
    )
    # same seed -> identical pattern
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = fused_adaln_ffn_train(
        x, shift, scale, gate, mask, w1, b1, w2, b2,
        dropout_rate=0.5, rng=jax.random.PRNGKey(8),
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out3))
    # inverted-dropout scaling keeps the expectation: mean over many seeds
    # approaches the dropout-free output
    outs = [
        np.asarray(fused_adaln_ffn_train(
            x, shift, scale, gate, mask, w1, b1, w2, b2,
            dropout_rate=0.5, rng=jax.random.PRNGKey(100 + i),
        ))
        for i in range(24)
    ]
    base = np.asarray(fused_adaln_ffn_train(
        x, shift, scale, gate, mask, w1, b1, w2, b2,
        dropout_rate=0.0,
    ))
    resid = np.mean(outs, axis=0) - base
    scale_ref = np.abs(base - np.asarray(x)).mean() + 1e-6
    assert np.abs(resid).mean() / scale_ref < 0.25


@_tpu_only
def test_dropout_backward_uses_same_mask():
    """grad at rate>0 must chain through the SAME keep-mask the forward
    used: finite-difference check along the x direction."""
    x, shift, scale, gate, mask, w1, b1, w2, b2 = _inputs(B=1, T=32, C=128, F=256)
    rng = jax.random.PRNGKey(3)

    def f(xv):
        return jnp.sum(fused_adaln_ffn_train(
            xv, shift, scale, gate, mask, w1, b1, w2, b2,
            dropout_rate=0.3, rng=rng,
        ) ** 2)

    g = jax.grad(f)(x)
    d = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    eps = 1e-3
    fd = (f(x + eps * d) - f(x - eps * d)) / (2 * eps)
    analytic = jnp.sum(g * d)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2)
