"""Fused mu-prenet training kernel (ops/prenet_pallas_train.py) vs the XLA
chain: forward and all gradients."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.ops.prenet_pallas_train import fused_prenet_train


def _oracle(mu, wa, ba, wb, bb, wc, bc):
    def conv(h, w, bias):
        return jax.lax.conv_general_dilated(
            h, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC")
        ) + bias

    h = nn.silu(conv(mu, wa, ba))
    h = nn.silu(conv(h, wb, bb))
    return conv(h, wc, bc)


def _inputs(B=2, T=40, CIN=16, F=64, COUT=24):
    ks = [jax.random.PRNGKey(i) for i in range(7)]
    mu = jax.random.normal(ks[0], (B, T, CIN))
    wa = jax.random.normal(ks[1], (3, CIN, F)) * 0.15
    ba = jax.random.normal(ks[2], (F,)) * 0.05
    wb = jax.random.normal(ks[3], (3, F, F)) * 0.05
    bb = jax.random.normal(ks[4], (F,)) * 0.05
    wc = jax.random.normal(ks[5], (3, F, COUT)) * 0.1
    bc = jax.random.normal(ks[6], (COUT,)) * 0.05
    return mu, wa, ba, wb, bb, wc, bc


def test_fwd_matches_oracle():
    args = _inputs()
    got = fused_prenet_train(*args, interpret=True)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_oracle():
    args = _inputs()
    cot = jax.random.normal(jax.random.PRNGKey(9),
                            (args[0].shape[0], args[0].shape[1], 24))

    g_fused = jax.grad(
        lambda *a: jnp.sum(fused_prenet_train(*a, interpret=True) * cot),
        argnums=tuple(range(7)),
    )(*args)
    g_oracle = jax.grad(
        lambda *a: jnp.sum(_oracle(*a) * cot), argnums=tuple(range(7)),
    )(*args)
    for name, a, b in zip(
        ("dmu", "dwa", "dba", "dwb", "dbb", "dwc", "dbc"), g_fused, g_oracle,
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4, err_msg=name,
        )
