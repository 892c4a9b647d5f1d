"""Fused Pallas attention (ops/attention_pallas.py) vs the XLA einsum oracle.

Runs in Pallas interpret mode on CPU; the same kernel compiles on TPU.
Covers the reference's SDPA semantics (models/diffusion_transformer.py:77):
key-padding masking, non-block-multiple sequence lengths, f32 and bf16.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stabletts_tpu.ops.attention import masked_attention
from stabletts_tpu.ops.attention_pallas import fused_attention


def _rand(shape, key, dtype):
    return jax.random.normal(jax.random.PRNGKey(key), shape).astype(dtype)


@pytest.mark.parametrize("t", [128, 200, 384])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_xla(t, dtype):
    b, h, d = 3, 4, 64
    q = _rand((b, t, h, d), 0, dtype)
    k = _rand((b, t, h, d), 1, dtype)
    v = _rand((b, t, h, d), 2, dtype)
    lengths = np.array([t, max(1, t // 2), max(1, t - 7)])
    mask = (jnp.arange(t)[None] < jnp.asarray(lengths)[:, None]).astype(jnp.float32)

    ref = masked_attention(q, k, v, mask=mask, impl="xla").astype(jnp.float32)
    out = fused_attention(q, k, v, mask, blk_q=128, interpret=True).astype(jnp.float32)

    valid = np.asarray(mask)[:, :, None, None]
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(out) * valid, np.asarray(ref) * valid, atol=tol)


def test_fused_no_mask():
    b, t, h, d = 2, 256, 4, 64
    q = _rand((b, t, h, d), 3, jnp.float32)
    k = _rand((b, t, h, d), 4, jnp.float32)
    v = _rand((b, t, h, d), 5, jnp.float32)
    ref = masked_attention(q, k, v, impl="xla")
    out = fused_attention(q, k, v, None, blk_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_masked_attention_fused_impl_dispatch():
    b, t, h, d = 2, 160, 4, 64
    q = _rand((b, t, h, d), 6, jnp.float32)
    k = _rand((b, t, h, d), 7, jnp.float32)
    v = _rand((b, t, h, d), 8, jnp.float32)
    mask = jnp.ones((b, t), jnp.float32)
    # CPU: interpret-mode pallas via monkeypatched default? Just call kernel in
    # interpret mode directly and the dispatch path on xla for equivalence.
    ref = masked_attention(q, k, v, mask=mask, impl="xla")
    out = fused_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("t", [128, 200])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_tminor_kernel_matches_xla(t, dtype):
    """fused_attention_packed_t on [B, C, T] operands == the XLA oracle on
    the same logical [B, T, C] values (ops/attention_pallas_t.py)."""
    from stabletts_tpu.ops.attention_pallas_t import fused_attention_packed_t

    b, h, d = 3, 4, 64
    q = _rand((b, t, h, d), 0, dtype)
    k = _rand((b, t, h, d), 1, dtype)
    v = _rand((b, t, h, d), 2, dtype)
    lengths = np.array([t, max(1, t // 2), max(1, t - 7)])
    mask = (jnp.arange(t)[None] < jnp.asarray(lengths)[:, None]).astype(jnp.float32)

    ref = masked_attention(q, k, v, mask=mask, impl="xla").astype(jnp.float32)
    qT = jnp.swapaxes(q.reshape(b, t, h * d), 1, 2)
    kT = jnp.swapaxes(k.reshape(b, t, h * d), 1, 2)
    vT = jnp.swapaxes(v.reshape(b, t, h * d), 1, 2)
    outT = fused_attention_packed_t(qT, kT, vT, mask, n_heads=h, blk_q=128,
                                    interpret=True)
    out = jnp.swapaxes(outT, 1, 2).reshape(b, t, h, d).astype(jnp.float32)

    valid = np.asarray(mask)[:, :, None, None]
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(out) * valid, np.asarray(ref) * valid, atol=tol)


def test_rope_matmul_formulation_bit_exact():
    # the packed signed-permutation RoPE must equal apply_rope EXACTLY in
    # every dtype (each output column of P is +/- one input column)
    from stabletts_tpu.nn.blocks import (
        _rope_neg_half_matrix,
        _rope_packed_cache,
        apply_rope,
    )

    b, t, h, d = 2, 24, 4, 64
    rot = d // 2
    for dtype in (jnp.float32, jnp.bfloat16):
        x = _rand((b, t, h * d), 0, dtype)
        ref = apply_rope(x.reshape(b, t, h, d), rot).reshape(b, t, h * d)
        cosv, sinv = _rope_packed_cache(t, h, d, rot, dtype)
        perm = _rope_neg_half_matrix(h, d, rot).astype(dtype)
        got = x * cosv[None] + (x @ perm) * sinv[None]
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
