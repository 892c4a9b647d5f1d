"""Fused MPD period-discriminator stack kernel (ops/mpd_pallas.py) vs the
flax DiscriminatorP — interpret-mode parity (the measured-negative perf
record lives in docs/DESIGN.md "Fused discriminator stack")."""

import jax
import jax.numpy as jnp
import pytest

from stabletts_tpu.models.discriminators import DiscriminatorP
from stabletts_tpu.ops.mpd_pallas import mpd_stack_fused


@pytest.mark.parametrize("t", [20480, 8190])
def test_mpd_stack_fused_matches_flax(t):
    B = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, t)) * 0.3
    d = DiscriminatorP(period=2, use_weight_norm=False)
    variables = d.init(jax.random.PRNGKey(1), x)

    ref_logits, ref_fmaps = d.apply(variables, x)
    got_logits, got_fmaps = mpd_stack_fused(
        x, variables["params"], period=2, interpret=True
    )

    assert len(ref_fmaps) == len(got_fmaps) == 5
    for i, (a, b) in enumerate(zip(ref_fmaps, got_fmaps)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 2e-4, f"fmap {i}: max err {err}"
    assert ref_logits.shape == got_logits.shape
    assert float(jnp.max(jnp.abs(ref_logits - got_logits))) < 2e-4
