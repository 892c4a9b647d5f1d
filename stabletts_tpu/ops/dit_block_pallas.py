"""Whole-DiT-block fused Pallas kernel (inference): BOTH halves per launch.

Round 4 made the two half-block kernels (ops/dit_attention_pallas.py,
ops/ffn_pallas.py) the default TPU inference path. This kernel goes one
step further and runs the complete block

    x1 = x + gate_msa * out_proj(attn(rope(qkv(mod(LN(x)))))) * mask
    y  = x1 + gate_mlp * conv2(silu(conv1(mod(LN(x1)) * mask)) * mask) * mask

in ONE launch per batch element: x makes a single HBM round trip per block
instead of two, and the ODE loop issues half the kernel launches
(6 blocks x 10 steps: 60 instead of 120 per utterance batch).

Reference semantics: models/diffusion_transformer.py:10-30 (FFN),
:33-81 (attention), :116-121 (adaLN-Zero block wiring).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.ops.dit_attention_pallas import _NEG, _rope_packed, _rope_tables
from stabletts_tpu.ops.ffn_pallas import _conv3


def _block_kernel(x_ref, mod_ref, mask_ref, bias_ref, cos_ref, sin_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  o_ref, *, n_heads: int, head_dim: int, rotary_dim: int,
                  eps: float):
    x = x_ref[0]                          # [T, C]
    shift_msa = mod_ref[0, 0:1, :]
    scale_msa = mod_ref[0, 1:2, :]
    gate_msa = mod_ref[0, 2:3, :]
    shift_mlp = mod_ref[0, 3:4, :]
    scale_mlp = mod_ref[0, 4:5, :]
    gate_mlp = mod_ref[0, 5:6, :]
    m = jnp.transpose(mask_ref[0])        # [1, T] -> [T, 1]
    bias = bias_ref[0]                    # [1, T] additive key bias

    # ---- attention half (== dit_attention_pallas._kernel) ----------------
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + scale_msa.astype(jnp.float32)) + shift_msa.astype(jnp.float32)
    h = h.astype(x.dtype)

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
        s = s + bias
        mx = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp2(s - mx)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        outs.append(wv / denom)
    att = jnp.concatenate(outs, axis=-1).astype(x.dtype)

    out = jnp.dot(att, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:][None, :]
    x1f = xf + out * gate_msa.astype(jnp.float32) * m  # [T, C] f32

    # ---- FFN half (== ffn_pallas._ffn_kernel) ----------------------------
    mu2 = jnp.mean(x1f, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(x1f - mu2), axis=-1, keepdims=True)
    h2 = (x1f - mu2) * jax.lax.rsqrt(var2 + eps)
    h2 = h2 * (1.0 + scale_mlp.astype(jnp.float32)) + shift_mlp.astype(jnp.float32)
    h2 = (h2 * m).astype(x.dtype)

    y = _conv3(h2, w1_ref[:], b1_ref[:])
    y = jax.nn.silu(y)
    y = (y * m).astype(x.dtype)
    z = _conv3(y, w2_ref[:], b2_ref[:])
    z = z * m
    o_ref[0] = (x1f + gate_mlp.astype(jnp.float32) * z).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def fused_dit_block(x, mods, mask,
                    wq, bq, wk, bk, wv, bv, wo, bo,
                    w1, b1, w2, b2,
                    n_heads: int = 4, eps: float = 1e-5,
                    interpret: bool = False):
    """x: [B, T, C] (pre-masked); mods: 6-tuple of [B, C] adaLN modulation
    (shift/scale/gate msa then mlp); mask: [B, T]. Dense kernels [C, C],
    FFN conv kernels [3, C, F] / [3, F, C]. T must be a multiple of 8.
    """
    b, t, c = x.shape
    head_dim = c // n_heads
    rotary_dim = int(head_dim * 0.5)
    mod = jnp.stack(mods, axis=1)  # [B, 6, C]
    maskf = mask.astype(jnp.float32)
    kbias = jnp.where(maskf > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    cosc, sinc = _rope_tables(t, c, n_heads, head_dim, rotary_dim)
    f = w1.shape[-1]

    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_kernel, n_heads=n_heads, head_dim=head_dim,
                          rotary_dim=rotary_dim, eps=eps),
        grid=(b,),
        in_specs=[
            xspec,
            pl.BlockSpec((1, 6, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            full((t, c)), full((t, c)),
            full((c, c)), full((c,)), full((c, c)), full((c,)),
            full((c, c)), full((c,)), full((c, c)), full((c,)),
            full((3, c, f)), full((f,)), full((3, f, c)), full((c,)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * c * (4 * c) + 4 * b * n_heads * t * t * head_dim
            + 2 * 2 * b * t * 3 * c * f,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize,
            transcendentals=b * n_heads * t * t + b * t * f,
        ),
        interpret=interpret,
    )(x, mod, maskf[:, None, :], kbias, cosc, sinc,
      wq, bq, wk, bk, wv, bv, wo, bo, w1, b1, w2, b2)
