"""Differentiable fused Pallas TPU kernel for the DiT block's FFN half.

Training counterpart of ops/ffn_pallas.py (VERDICT r4 #4 "whole-half
training kernel"). Computes, per DiT block (reference:
models/diffusion_transformer.py:10-30, :116-121):

    out = x + gate * ( conv2( drop(silu(conv1( mod(LN(x)) * m ))) * m ) * m )

with a hand-written backward producing dx, d{shift,scale,gate}, dW1, db1,
dW2, db2 in ONE kernel launch each direction. Motivation (r5 profile,
B=32 T=1024 bf16): XLA's FFN backward runs ~3x off the MXU floor — the
conv-grad fusions keep T-minor ({2,0,1}) layouts with in-fusion transposes
(dW [3,1024,256] measured 0.81 ms vs the 0.26 ms bf16 matmul floor) and the
[B,T,F] silu intermediate makes an HBM round trip in both directions. Here
each grid cell (one batch element) keeps h/y/sd in VMEM and computes the
conv grads as row-major shifted matmuls.

Structure follows ops/attention_pallas_train.py:
  * dropout via the on-core PRNG, seeded per (base_seed, grid cell) so the
    backward regenerates the identical keep-mask instead of storing [B,T,F]
  * backward recomputes the forward intermediates (LN stats, h, y, keep)
  * dW/db accumulate across batch grid cells into revisited f32 output
    blocks (init at cell 0, grid dimension "arbitrary")
  * custom_vjp wires the kernels; residuals are just the inputs

Conv tap convention (= ffn_pallas._conv3): y[t] = h[t-1]@w[0] + h[t]@w[1]
+ h[t+1]@w[2], so dh = shift_up(dy)@w0^T + dy@w1^T + shift_down(dy)@w2^T
and dW[j] = (h shifted as in forward)^T @ dy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.ops.ffn_pallas import _conv3, _shift_down, _shift_up


def _keep_mask(shape, rate: float):
    bits = pltpu.prng_random_bits(shape)
    u = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return (u >= thresh).astype(jnp.float32)


def _ln_mod(x, mod_ref, eps):
    """LN (no affine, f32 stats) + adaLN modulate; returns (xf, n, h0)."""
    shift = mod_ref[0, 0:1, :].astype(jnp.float32)
    scale = mod_ref[0, 1:2, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (xf - mu) * rstd
    h0 = n * (1.0 + scale) + shift
    return xf, n, h0, rstd, scale


def _fwd_kernel(seed_ref, x_ref, mod_ref, mask_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, o_ref, *, eps: float, rate: float):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[0]
    gate = mod_ref[0, 2:3, :].astype(jnp.float32)
    m = jnp.transpose(mask_ref[0])  # [T, 1]
    xf, _, h0, _, _ = _ln_mod(x, mod_ref, eps)
    h = (h0 * m).astype(x.dtype)
    y = _conv3(h, w1_ref[:], b1_ref[:])          # [T, F] f32
    s = jax.nn.silu(y)
    if rate > 0.0:
        s = s * (_keep_mask(s.shape, rate) * (1.0 / (1.0 - rate)))
    sd = (s * m).astype(x.dtype)
    z = _conv3(sd, w2_ref[:], b2_ref[:]) * m     # [T, C] f32
    o_ref[0] = (xf + gate * z).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, mod_ref, mask_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, do_ref,
                dx_ref, dmod_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                *, eps: float, rate: float):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x = x_ref[0]
    in_dtype = x.dtype
    gate = mod_ref[0, 2:3, :].astype(jnp.float32)
    m = jnp.transpose(mask_ref[0])  # [T, 1]
    do = do_ref[0].astype(jnp.float32)

    # ---- recompute forward (identical ops/order to _fwd_kernel) ----------
    xf, n, h0, rstd, scale = _ln_mod(x, mod_ref, eps)
    h = (h0 * m).astype(in_dtype)
    y = _conv3(h, w1_ref[:], b1_ref[:])
    s = jax.nn.silu(y)
    if rate > 0.0:
        keep = _keep_mask(s.shape, rate) * (1.0 / (1.0 - rate))
        s = s * keep
    sd = (s * m).astype(in_dtype)
    z = _conv3(sd, w2_ref[:], b2_ref[:]) * m

    # ---- backward ---------------------------------------------------------
    # out = xf + gate * z
    dgate = jnp.sum(do * z, axis=0, keepdims=True)        # [1, C]
    dz = (do * gate) * m                                   # [T, C] f32
    dzc = dz.astype(in_dtype)
    # conv2: z = conv3(sd, w2) (+b2); dW2[j] = shifted(sd)^T @ dz
    db2_ref[:] += jnp.sum(dz, axis=0)
    w2 = w2_ref[:]
    dsd = jnp.dot(dzc, jnp.transpose(w2[1]), preferred_element_type=jnp.float32)
    dsd += jnp.dot(_shift_up(dzc), jnp.transpose(w2[0]),
                   preferred_element_type=jnp.float32)
    dsd += jnp.dot(_shift_down(dzc), jnp.transpose(w2[2]),
                   preferred_element_type=jnp.float32)
    dw2_ref[0] += jax.lax.dot_general(
        _shift_down(sd), dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw2_ref[1] += jax.lax.dot_general(
        sd, dzc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw2_ref[2] += jax.lax.dot_general(
        _shift_up(sd), dzc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # through mask/cast, dropout, silu
    ds = dsd * m
    if rate > 0.0:
        ds = ds * keep
    sig = jax.nn.sigmoid(y)
    dy = ds * (sig * (1.0 + y * (1.0 - sig)))              # [T, F] f32
    dyc = dy.astype(in_dtype)
    # conv1: y = conv3(h, w1) + b1
    db1_ref[:] += jnp.sum(dy, axis=0)
    w1 = w1_ref[:]
    dh = jnp.dot(dyc, jnp.transpose(w1[1]), preferred_element_type=jnp.float32)
    dh += jnp.dot(_shift_up(dyc), jnp.transpose(w1[0]),
                  preferred_element_type=jnp.float32)
    dh += jnp.dot(_shift_down(dyc), jnp.transpose(w1[2]),
                  preferred_element_type=jnp.float32)
    dw1_ref[0] += jax.lax.dot_general(
        _shift_down(h), dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw1_ref[1] += jax.lax.dot_general(
        h, dyc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw1_ref[2] += jax.lax.dot_general(
        _shift_up(h), dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # through mask, modulate, LN
    dh0 = dh * m                                           # [T, C] f32
    dshift = jnp.sum(dh0, axis=0, keepdims=True)
    dscale = jnp.sum(dh0 * n, axis=0, keepdims=True)
    dn = dh0 * (1.0 + scale)
    c = x.shape[-1]
    dn_mean = jnp.sum(dn, axis=-1, keepdims=True) * (1.0 / c)
    dnn_mean = jnp.sum(dn * n, axis=-1, keepdims=True) * (1.0 / c)
    dx_ln = (dn - dn_mean - n * dnn_mean) * rstd
    dx_ref[0] = (do + dx_ln).astype(dx_ref.dtype)
    dmod_ref[0] = jnp.concatenate([dshift, dscale, dgate], axis=0).astype(
        dmod_ref.dtype
    )


def _specs(b, t, c, f):
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 3, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, 1, t), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return full, xspec, mspec, kspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _ffn_core(x, mod, maskf, w1, b1, w2, b2, rate, eps, interpret, seed):
    out, _ = _ffn_fwd(x, mod, maskf, w1, b1, w2, b2, rate, eps, interpret, seed)
    return out


def _ffn_fwd(x, mod, maskf, w1, b1, w2, b2, rate, eps, interpret, seed):
    b, t, c = x.shape
    f = w1.shape[-1]
    full, xspec, mspec, kspec = _specs(b, t, c, f)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, rate=rate),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xspec, mspec, kspec,
            full((3, c, f)), full((f,)), full((3, f, c)), full((c,)),
        ],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * 3 * c * f,
            bytes_accessed=2 * b * t * c * x.dtype.itemsize,
            transcendentals=b * t * f,
        ),
        interpret=interpret,
    )(seed, x, mod, maskf, w1, b1, w2, b2)
    return out, (x, mod, maskf, w1, b1, w2, b2, seed)


def _ffn_bwd(rate, eps, interpret, res, do):
    x, mod, maskf, w1, b1, w2, b2, seed = res
    b, t, c = x.shape
    f = w1.shape[-1]
    full, xspec, mspec, kspec = _specs(b, t, c, f)
    dx, dmod, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps, rate=rate),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xspec, mspec, kspec,
            full((3, c, f)), full((f,)), full((3, f, c)), full((c,)),
            xspec,
        ],
        out_specs=(
            xspec, mspec,
            full((3, c, f)), full((f,)), full((3, f, c)), full((c,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct((b, 3, c), jnp.float32),
            jax.ShapeDtypeStruct((3, c, f), jnp.float32),
            jax.ShapeDtypeStruct((f,), jnp.float32),
            jax.ShapeDtypeStruct((3, f, c), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * b * t * 3 * c * f,
            bytes_accessed=4 * b * t * c * x.dtype.itemsize,
            transcendentals=2 * b * t * f,
        ),
        interpret=interpret,
    )(seed, x, mod, maskf, w1, b1, w2, b2, do)
    return (dx, dmod.astype(mod.dtype), None,
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), None)


_ffn_core.defvjp(_ffn_fwd, _ffn_bwd)


def fused_adaln_ffn_train(x, shift, scale, gate, mask, w1, b1, w2, b2,
                          dropout_rate: float = 0.0, rng=None,
                          eps: float = 1e-5, interpret: bool = False):
    """Differentiable fused DiT FFN half. x: [B, T, C]; shift/scale/gate:
    [B, C]; mask: [B, T]; w1 [3, C, F], w2 [3, F, C].

    Returns x + gate * FFN(modulate(LN(x))) with masking at every conv
    boundary (== the XLA training path), differentiable in x, the three
    modulation vectors, and all four conv params. dropout_rate > 0 requires
    `rng`; the backward regenerates the same in-kernel dropout pattern from
    a scalar seed. T must be a multiple of 8.
    """
    if w1.shape[0] != 3 or w2.shape[0] != 3:
        raise ValueError("fused_adaln_ffn_train hard-codes kernel_size 3")
    mod = jnp.stack([shift, scale, gate], axis=1)  # [B, 3, C]
    maskf = mask.astype(jnp.float32)[:, None, :]
    if dropout_rate > 0.0:
        assert rng is not None, "dropout_rate > 0 requires an rng key"
        seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max,
                                  jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _ffn_core(x, mod, maskf, w1, b1, w2, b2, float(dropout_rate), eps,
                    interpret, seed)
    return out
