"""Fused Pallas TPU kernel for the DiT block's ATTENTION half (inference).

Computes, per DiT block (reference: models/diffusion_transformer.py:33-81,
:116-118), in ONE kernel per batch element:

    h          = modulate(LN(x), shift, scale)         # LN: no affine, f32
    q, k, v    = h @ Wq + bq, h @ Wk + bk, h @ Wv + bv
    q, k       = partial_rope(q), partial_rope(k)      # rotary_dim = D/2
    att        = softmax(q k^T / sqrt(D) + key_bias) v  # per head, f32 stats
    out        = att @ Wo + bo
    return x + gate * out * mask

vs the XLA pipeline, this removes: the LayerNorm/modulate HBM round trips,
the qkv/out projection layout copies around the attention custom call
(bf16[B,T,C] {1,2,0}<->{2,1,0} copies, ~5 ms/run measured), and the RoPE
slice/negate fusions — everything runs on the [T, C] tile resident in VMEM.

RoPE without per-head lane slicing: the neg-half permutation
  neg_half(x)[l] = -x[l+half]  (l in [0, half))   |  x[l-half]  (l in [half, rot))
is implemented with two GLOBAL lane rolls of the packed [T, H*D] tile plus a
lane-index select — the roll wrap-around only lands on lanes the select
rejects. cos/sin are pre-broadcast to [T, H*D] f32 with 1/0 in the
pass-through lanes, so RoPE is pure elementwise VPU work.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _rope_packed(x, cosc, sinc, half, head_dim):
    """x [T, C=H*D]; cosc/sinc [T, C] f32 (0/1 padded past rotary lanes)."""
    c = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % head_dim
    xf = x.astype(jnp.float32)
    fwd = pltpu.roll(xf, half, 1)        # lane l <- x[l - half]
    bwd = pltpu.roll(xf, c - half, 1)    # lane l <- x[l + half] (roll -half)
    neg_half = jnp.where(lane < half, -bwd, fwd)
    return (xf * cosc + neg_half * sinc).astype(x.dtype)


def _kernel(x_ref, mod_ref, mask_ref, bias_ref, cos_ref, sin_ref,
            wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
            o_ref, *, n_heads: int, head_dim: int, rotary_dim: int, eps: float):
    x = x_ref[0]                          # [T, C]
    shift = mod_ref[0, 0:1, :]
    scale = mod_ref[0, 1:2, :]
    gate = mod_ref[0, 2:3, :]
    m = jnp.transpose(mask_ref[0])        # [1, T] -> [T, 1]
    bias = bias_ref[0]                    # [1, T] additive key bias

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    h = h.astype(x.dtype)

    # attention scale and log2(e) pre-folded into q (one [T, C] multiply
    # instead of scaling every [T, T] score tile); softmax runs in exp2,
    # the VPU-native exponential. RoPE is an elementwise rotation, so the
    # scalar commutes through it.
    scale_a = math.log2(math.e) / math.sqrt(head_dim)
    q = (jnp.dot(h, wq_ref[:], preferred_element_type=jnp.float32)
         + bq_ref[:][None, :]) * scale_a
    k = jnp.dot(h, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:][None, :]
    v = (jnp.dot(h, wv_ref[:], preferred_element_type=jnp.float32)
         + bv_ref[:][None, :]).astype(x.dtype)
    q = _rope_packed(q.astype(x.dtype), cos_ref[:], sin_ref[:], rotary_dim // 2, head_dim)
    k = _rope_packed(k.astype(x.dtype), cos_ref[:], sin_ref[:], rotary_dim // 2, head_dim)

    outs = []
    for hh in range(n_heads):
        sl = slice(hh * head_dim, (hh + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # s is in log2 units; bias is 0 / -huge so it needs no rescaling
        s = s + bias
        mx = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp2(s - mx)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        outs.append(wv / denom)
    att = jnp.concatenate(outs, axis=-1).astype(x.dtype)

    out = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:][None, :]
    out = out * gate.astype(jnp.float32) * m
    o_ref[0] = (xf + out).astype(o_ref.dtype)


def _rope_tables(t, c, n_heads, head_dim, rotary_dim, base=10_000.0):
    """cos/sin broadcast to the packed [T, C] layout, f32; 1/0 past rotary.

    Must match nn/blocks.py:rope_cache exactly: theta_i over even indices,
    interleave-free layout cos[t, i] = cos(t * theta_{i % half})... the
    reference RotaryPositionalEmbeddings builds cos/sin of shape
    [T, rotary_dim] via idx_theta = outer(t, theta) tiled twice.
    """
    half = rotary_dim // 2
    theta = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rotary_dim))
    idx = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]  # [T, half]
    idx2 = jnp.concatenate([idx, idx], axis=-1)  # [T, rot]
    cos = jnp.cos(idx2)
    sin = jnp.sin(idx2)
    pad = head_dim - rotary_dim
    cos_h = jnp.concatenate([cos, jnp.ones((t, pad), jnp.float32)], axis=-1)
    sin_h = jnp.concatenate([sin, jnp.zeros((t, pad), jnp.float32)], axis=-1)
    return jnp.tile(cos_h, (1, n_heads)), jnp.tile(sin_h, (1, n_heads))


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def fused_dit_attention(x, shift, scale, gate, mask,
                        wq, bq, wk, bk, wv, bv, wo, bo,
                        n_heads: int = 4, eps: float = 1e-5,
                        interpret: bool = False):
    """x: [B, T, C] (pre-masked); shift/scale/gate: [B, C]; mask: [B, T].

    Weight layout: flax Dense kernels [C, C], biases [C]. rotary_dim is
    head_dim // 2 as in the reference (diffusion_transformer.py:48-49).
    T must be a multiple of 8.
    """
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    mod = jnp.stack([shift, scale, gate], axis=1)  # [B, 3, C]
    maskf = mask.astype(jnp.float32)
    kbias = jnp.where(maskf > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    cosc, sinc = _rope_tables(t, c, n_heads, head_dim, rotary_dim)

    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n_heads=n_heads, head_dim=head_dim,
                          rotary_dim=rotary_dim, eps=eps),
        grid=(b,),
        in_specs=[
            xspec,
            pl.BlockSpec((1, 3, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            full((t, c)), full((t, c)),
            full((c, c)), full((c,)), full((c, c)), full((c,)),
            full((c, c)), full((c,)), full((c, c)), full((c,)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (4 * c) + 4 * b * n_heads * t * t * head_dim,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize,
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(x, mod, mask[:, None, :].astype(jnp.float32), kbias, cosc, sinc,
      wq, bq, wk, bk, wv, bv, wo, bo)
