"""Fused Pallas TPU kernel for the Vocos ConvNeXt block (inference path).

One kernel per block computes, per batch element in VMEM (reference:
vocoders/vocos/models/module.py:5-46):

    h = dwconv_k7(x)                 # depthwise: 7 shifted VPU multiply-adds
    h = LN(h) * ln_scale + ln_bias   # f32 stats, eps 1e-6
    y = gelu(h @ W1 + b1)            # tanh GELU (see models/vocos.py:_gelu)
    z = y @ W2 + b2
    out = x + gamma * z

Why: XLA lowers the k=7 depthwise conv into reshape/transpose/reduce chains
([32,1000,4,512] intermediates + layout copies, ~2.9 ms/run measured on v5e
at the inference shape) because grouped convs can't use the MXU; here it is
7 shifted elementwise FMAs on the [T, C] tile that is already resident for
the pointwise matmuls. The [T, 3C] intermediate also never touches HBM.

Deterministic inference only (no dropout in the block; the GAN training path
keeps the XLA version for autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dwconv7(x, w, b):
    """x [T, C], w [7, C], b [C] -> [T, C]; SAME zero padding over rows."""
    t = x.shape[0]
    acc = x * w[3][None, :]
    for d in range(1, 4):
        # rows shifted down by d: contribution of x[t-d] via tap w[3-d]
        x_dn = jnp.concatenate([jnp.zeros_like(x[:d]), x[:-d]], axis=0)
        # rows shifted up by d: contribution of x[t+d] via tap w[3+d]
        x_up = jnp.concatenate([x[d:], jnp.zeros_like(x[:d])], axis=0)
        acc = acc + x_dn * w[3 - d][None, :] + x_up * w[3 + d][None, :]
    return acc + b[None, :]


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| <= 1.5e-7): Mosaic has no
    erf/erfc lowering, so jax.nn.gelu(approximate=False) cannot compile
    inside a TPU kernel; exp can."""
    p = 0.3275911
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel(y, approximate: bool):
    if approximate:
        return jax.nn.gelu(y, approximate=True)
    return 0.5 * y * (1.0 + _erf_poly(y * 0.7071067811865476))


def _block_kernel(x_ref, dww_ref, dwb_ref, lns_ref, lnb_ref,
                  w1_ref, b1_ref, w2_ref, b2_ref, g_ref, o_ref, *, eps: float,
                  approximate_gelu: bool):
    x = x_ref[0]                                   # [T, C]
    h = _dwconv7(x.astype(jnp.float32), dww_ref[:].astype(jnp.float32),
                 dwb_ref[:].astype(jnp.float32))
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[:].astype(jnp.float32)[None, :] + lnb_ref[:].astype(jnp.float32)[None, :]
    h = h.astype(x.dtype)
    y = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32)
    y = y + b1_ref[:].astype(jnp.float32)[None, :]
    y = _gelu_kernel(y, approximate_gelu).astype(x.dtype)
    z = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
    z = z + b2_ref[:].astype(jnp.float32)[None, :]
    z = z * g_ref[:].astype(jnp.float32)[None, :]
    o_ref[0] = (x.astype(jnp.float32) + z).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convnext_block(x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2,
                         gamma, eps: float = 1e-6, interpret: bool = False):
    """x: [B, T, C]; dw_w: [7, C]; w1: [C, F]; w2: [F, C]; gamma: [C].

    Returns x + gamma * pw2(gelu(pw1(LN(dwconv(x))))). T multiple of 8.
    """
    b, t, c = x.shape
    f = w1.shape[-1]
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    # GELU variant matches models/vocos.py:_gelu — exact erf at f32 (torch
    # parity), tanh at bf16
    return pl.pallas_call(
        functools.partial(_block_kernel, eps=eps,
                          approximate_gelu=x.dtype == jnp.bfloat16),
        grid=(b,),
        in_specs=[
            xspec,
            full((7, c)), full((c,)), full((c,)), full((c,)),
            full((c, f)), full((f,)), full((f, c)), full((c,)), full((c,)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * c * f,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize + 2 * c * f * w1.dtype.itemsize,
            transcendentals=b * t * f,
        ),
        interpret=interpret,
    )(x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma)
