"""Experimental attention kernel variants (benched via tools/attn_bench.py).

v2 over ops/attention_pallas.py:
  - scale and log2(e) folded into the query ONCE ([blk,C] multiply) instead
    of scaling the [blk,T] score tile per head (saves B*H*T^2 VPU mults);
    softmax then uses exp2, the VPU-native exponential
  - per-head outputs written straight into o_ref column slices — no
    end-of-kernel concatenate buffer
  - key bias pre-scaled by log2(e) outside (0 / -inf semantics unchanged)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)


def _attn_kernel_v2(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads: int,
                    head_dim: int):
    q = q_ref[0]  # [blk_q, H*D], pre-scaled by scale*log2e
    k = k_ref[0]  # [T_pad, H*D]
    v = v_ref[0]  # [T_pad, H*D]
    bias = bias_ref[0]  # [1, T_pad] in log2 units
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk_q, T_pad], already in log2 units
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp2(s - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (wv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "blk_q", "interpret"))
def fused_attention_packed(q, k, v, mask=None, n_heads: int = 4,
                           blk_q: int = 512, interpret: bool = False):
    b, t, c = q.shape
    head_dim = c // n_heads
    scale = _LOG2E / math.sqrt(head_dim)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    t128 = -(-t // 128) * 128
    blk_q = next(cand for cand in (blk_q, 512, 256, 128)
                 if cand <= blk_q and t128 % cand == 0)
    t_pad = -(-t // blk_q) * blk_q

    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.ones((b, t), jnp.float32) if mask is None else mask.astype(jnp.float32)
    if t_pad != t:
        valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    grid = (b, t_pad // blk_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel_v2, n_heads=n_heads, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
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
    return out[:, :t] if t_pad != t else out
