"""Fused Pallas TPU kernel for the DiT block's FFN half (inference path).

Fuses, per DiT block (reference: models/diffusion_transformer.py:10-30 and
:116-121):

    out = x + gate * conv2( silu(conv1( modulate(LN(x)) * m )) * m ) * m

into one kernel — LayerNorm (no affine, f32 stats), adaLN modulate,
k=3 "SAME" convs expressed as 3 shifted MXU matmuls each, SiLU, masking at
every conv boundary, gated residual. The XLA path writes the [B, T, 4C]
intermediate through HBM between the convs and runs the surrounding
elementwise ops as separate fusions; here one grid cell (one batch element)
keeps everything in VMEM: x tile 0.5 MB + intermediate 2 MB + both weight
sets 3 MB (bf16, C=256/F=1024/T=1024).

Deterministic (inference) only: the training path keeps XLA so FFN dropout
(reference :24) and autodiff work unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(h):
    """rows t -> t+1 (h[t-1] at row t), zero top row."""
    return jnp.concatenate([jnp.zeros_like(h[:1]), h[:-1]], axis=0)


def _shift_up(h):
    """rows t -> t-1 (h[t+1] at row t), zero bottom row."""
    return jnp.concatenate([h[1:], jnp.zeros_like(h[:1])], axis=0)


def _conv3(h, w, b):
    """k=3 SAME conv over rows: h [T, Cin], w [3, Cin, Cout], b [Cout]."""
    y = jnp.dot(h, w[1], preferred_element_type=jnp.float32)
    y += jnp.dot(_shift_down(h), w[0], preferred_element_type=jnp.float32)
    y += jnp.dot(_shift_up(h), w[2], preferred_element_type=jnp.float32)
    return y + b.astype(jnp.float32)[None, :]


def _ffn_kernel(x_ref, mod_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, eps: float):
    x = x_ref[0]                       # [T, C]
    t, c = x.shape
    shift = mod_ref[0, 0:1, :]         # [1, C]
    scale = mod_ref[0, 1:2, :]
    gate = mod_ref[0, 2:3, :]
    m = jnp.transpose(mask_ref[0])     # [1, T] -> [T, 1]

    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * (1.0 + scale.astype(jnp.float32)) + shift.astype(jnp.float32)
    h = (h * m).astype(x.dtype)

    y = _conv3(h, w1_ref[:], b1_ref[:])        # [T, F] f32
    y = jax.nn.silu(y)
    y = (y * m).astype(x.dtype)

    z = _conv3(y, w2_ref[:], b2_ref[:])        # [T, C] f32
    z = z * m
    o_ref[0] = (xf + gate.astype(jnp.float32) * z).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_adaln_ffn(x, shift, scale, gate, mask, w1, b1, w2, b2,
                    eps: float = 1e-5, interpret: bool = False):
    """x: [B, T, C]; shift/scale/gate: [B, C]; mask: [B, T] (1=valid);
    w1: [3, C, F], b1: [F]; w2: [3, F, C], b2: [C].

    Returns x + gate * FFN(modulate(LN(x))) with the reference's masking.
    T must be a multiple of 8 (the sampler pads to 256-multiples already).
    """
    if w1.shape[0] != 3 or w2.shape[0] != 3:
        raise ValueError(
            f"fused_adaln_ffn hard-codes kernel_size 3 taps; got w1 k={w1.shape[0]}, "
            f"w2 k={w2.shape[0]} — use the lax.conv FFN path for other kernel sizes"
        )
    b, t, c = x.shape
    f = w1.shape[-1]
    mod = jnp.stack([shift, scale, gate], axis=1)  # [B, 3, C]
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            full((3, c, f)),
            full((f,)),
            full((3, f, c)),
            full((c,)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * 3 * c * f,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize + 2 * 3 * c * f * w1.dtype.itemsize,
            transcendentals=b * t * f,
        ),
        interpret=interpret,
    )(x, mod, mask[:, None, :].astype(jnp.float32), w1, b1, w2, b2)
    return out
