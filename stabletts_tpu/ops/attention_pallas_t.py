"""T-minor (transposed-layout) variant of the packed-head attention kernel.

Motivation (see DESIGN.md "Layout copies"): XLA lays the DiT FFN's 1D-conv
operands out T-minor ({1,2,0} = a row-major [B, C, T] buffer), while a Pallas
custom call is row-major over its logical shape — with the [B, T, C] kernel
(ops/attention_pallas.py) the estimator loop therefore converts layouts at
every FFN<->attention boundary (~6.5% of inference device time profiled at
[64, 1024, 4x64] bf16).

This kernel consumes and produces LOGICAL [B, C, T] arrays: a row-major
[B, C, T] buffer is bit-identical to the conv's preferred T-minor layout of
the logical [B, T, C] tensor, so when the surrounding graph transposes are
pure layout changes XLA can elide them entirely.

Math per (batch, q-block) grid cell, head h (rows h*D..(h+1)*D):
    s'[k, q] = (K_h^T Q_h)[k, q] * scale + bias[k]     # lhsT-form dot, K=D
    w = softmax over k (the SUBLANE axis)
    o_h[d, q] = (V_h w)[d, q]                          # standard dot, K=T

Same padding/masking semantics as fused_attention_packed: `mask` masks KEYS
only; padded query columns hold finite garbage the caller masks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_kernel_t(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                   n_heads: int, head_dim: int):
    q = q_ref[0]  # [C, blk_q]
    k = k_ref[0]  # [C, T_pad]
    v = v_ref[0]  # [C, T_pad]
    bias = bias_ref[0]  # [T_pad, 1], adds along the key axis
    outs = []
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        # lhsT-form: contract the head_dim sublane axis of both operands
        s = jax.lax.dot_general(
            k[sl, :], q[sl, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T_pad, blk_q]
        s = s * scale + bias
        m = jnp.max(s, axis=0, keepdims=True)
        w = jnp.exp(s - m)
        denom = jnp.sum(w, axis=0, keepdims=True)
        ov = jax.lax.dot_general(
            v[sl, :], w.astype(v.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [head_dim, blk_q]
        outs.append(ov / denom)
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "blk_q", "interpret"))
def fused_attention_packed_t(q, k, v, mask=None, n_heads: int = 4,
                             blk_q: int = 512, interpret: bool = False):
    """q/k/v: [B, H*D, T] head-packed, channel-major; mask: [B, T] (1=valid).

    Returns [B, H*D, T]. Same numerics as fused_attention_packed on the
    transposed operands (softmax stats f32, PV accumulates f32).
    """
    b, c, t = q.shape
    head_dim = c // n_heads
    scale = 1.0 / math.sqrt(head_dim)
    if blk_q < 128:
        raise ValueError(f"blk_q must be >= 128, got {blk_q}")
    t128 = -(-t // 128) * 128
    blk_q = next(cand for cand in (blk_q, 512, 256, 128) if cand <= blk_q and t128 % cand == 0)
    t_pad = -(-t // blk_q) * blk_q

    if t_pad != t:
        pad = ((0, 0), (0, 0), (0, t_pad - t))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.ones((b, t), jnp.float32) if mask is None else mask.astype(jnp.float32)
    if t_pad != t:
        valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, :, None]  # [B,T_pad,1]

    grid = (b, t_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_t, scale=scale, n_heads=n_heads, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, c, blk_q), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, t_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, t_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, blk_q), lambda bi, qi: (bi, 0, qi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, t_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_heads * t_pad * t_pad * head_dim,
            bytes_accessed=4 * b * t_pad * c * q.dtype.itemsize,
            transcendentals=b * n_heads * t_pad * t_pad,
        ),
        interpret=interpret,
    )(q, k, v, kbias)
    return out[:, :, :t] if t_pad != t else out
