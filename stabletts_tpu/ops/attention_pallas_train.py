"""Differentiable fused Pallas TPU attention with in-kernel dropout.

Training counterpart of ops/attention_pallas.py: the reference trains with
`F.scaled_dot_product_attention(..., dropout_p=0.1)` (reference:
models/diffusion_transformer.py:77), i.e. dropout on the post-softmax
weights. The XLA einsum path materializes the [B, H, T, T] weight tensor in
HBM in both the forward and backward pass (512 MB per materialization at
B=32, T=1000, f32) — this module keeps the score tile in VMEM in both
directions.

Design (same packed-head layout as the inference kernel):
  * forward: per (batch, q-block) grid cell, loop over heads; softmax stats
    in f32; dropout via the on-core PRNG (pltpu.prng_*), seeded
    deterministically per grid cell so the BACKWARD kernel regenerates the
    identical keep-mask instead of storing a [B, H, T, T] mask.
  * backward: full recompute (s -> m -> w -> l -> p, like flash attention's
    bwd but without online tiling since T~1K rows of K/V fit in VMEM).
    dQ is per-q-block; dK/dV accumulate across q-blocks into a revisited
    output block (init at q-block 0, "arbitrary" grid dimension).
  * custom_vjp wires the two kernels together; no residuals besides inputs.

Dropout semantics match torch SDPA: out = (keep ⊙ p) / (1 - rate) @ v where
keep ~ Bernoulli(1 - rate) iid per (b, h, q, k) element. The RNG stream is
the Pallas TPU PRNG (different bit-pattern from torch, same distribution).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask from the seeded on-core PRNG, f32 {0,1}."""
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    # uniform in [0, 2^32) as unsigned; keep iff u >= rate * 2^32
    u = pltpu.bitcast(bits, jnp.uint32)
    thresh = jnp.uint32(min(int(rate * float(2**32)), 2**32 - 1))
    return (u >= thresh).astype(jnp.float32)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                scale: float, n_heads: int, head_dim: int, rate: float):
    # one PRNG stream per (batch, q-block) grid cell; heads consume bits in a
    # fixed order so the backward kernel regenerates identical masks
    if rate > 0.0:
        # multi-operand seeding mixes (base seed, cell) properly — integer
        # affine mixing allows cross-layer stream collisions
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], cell)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    outs = []
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp(s - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        if rate > 0.0:
            w = w * (_keep_mask(w.shape, rate) * (1.0 / (1.0 - rate)))
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        outs.append(wv / denom)
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale: float, n_heads: int, head_dim: int, rate: float):
    if rate > 0.0:
        cell = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0], cell)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    do = do_ref[0]
    dqs, dks, dvs = [], [], []
    in_dtype = q.dtype
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        doh = do[:, sl]
        # recompute p on the NATIVE dtype exactly like the forward: an f32
        # upcast here would regenerate a slightly different softmax than the
        # one the primal output used (and cost ~4x MXU time under bf16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp(s - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        p = w / denom
        if rate > 0.0:
            keep = _keep_mask(w.shape, rate) * (1.0 / (1.0 - rate))
            pd = p * keep
        else:
            keep = None
            pd = p
        # dV_h = pd^T @ dO — matmul operands in the native dtype (standard
        # mixed precision: bf16 inputs, f32 accumulation), softmax math f32
        dvs.append(jax.lax.dot_general(
            pd.astype(in_dtype), doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
        # dPd = dO @ V^T ; back through dropout ; back through softmax
        dpd = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = dpd * keep if rate > 0.0 else dpd
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(in_dtype)
        # dQ_h = ds @ K * scale ; dK_h = ds^T @ Q * scale
        dqs.append(jnp.dot(ds, kh, preferred_element_type=jnp.float32) * scale)
        dks.append(jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale)
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    # dK/dV accumulate across q-blocks into the revisited [T_pad, C] block —
    # the block dtype is f32 regardless of input dtype so bf16 training does
    # not compound rounding on every partial accumulation
    dk_ref[0] += jnp.concatenate(dks, axis=-1)
    dv_ref[0] += jnp.concatenate(dvs, axis=-1)


def _specs(blk_q, t_pad, c):
    qspec = pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return qspec, kvspec, bspec


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _attention_core(q, k, v, kbias, rate, n_heads, blk_q, interpret, seed):
    out, _ = _attention_fwd(q, k, v, kbias, rate, n_heads, blk_q, interpret, seed)
    return out


def _attention_fwd(q, k, v, kbias, rate, n_heads, blk_q, interpret, seed):
    b, t_pad, c = q.shape
    head_dim = c // n_heads
    scale = 1.0 / math.sqrt(head_dim)
    qspec, kvspec, bspec = _specs(blk_q, t_pad, c)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_heads=n_heads,
                          head_dim=head_dim, rate=rate),
        grid=(b, t_pad // blk_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM), qspec, kvspec, kvspec, bspec,
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, q, k, v, kbias)
    return out, (q, k, v, kbias, seed)


def _attention_bwd(rate, n_heads, blk_q, interpret, res, do):
    q, k, v, kbias, seed = res
    b, t_pad, c = q.shape
    head_dim = c // n_heads
    scale = 1.0 / math.sqrt(head_dim)
    qspec, kvspec, bspec = _specs(blk_q, t_pad, c)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_heads=n_heads,
                          head_dim=head_dim, rate=rate),
        grid=(b, t_pad // blk_q),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM), qspec, kvspec, kvspec, bspec, qspec,
        ],
        out_specs=(qspec, kvspec, kvspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
            # f32 accumulators (cast back to the input dtype below)
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, c), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # f32 training at T_pad=1024 needs ~17-30 MB of scoped VMEM
            # (K/V rows + per-head score tiles + dK/dV accumulators); v5e
            # has 128 MiB physical VMEM, the 16 MB default is conservative
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seed, q, k, v, kbias, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None


_attention_core.defvjp(_attention_fwd, _attention_bwd)


def fused_attention_train(q, k, v, mask=None, dropout_rate: float = 0.0,
                          rng=None, n_heads: int = 4, blk_q: int = 256,
                          interpret: bool = False):
    """Differentiable packed-head attention. q/k/v: [B, T, H*D].

    mask: [B, T] key validity (1=valid) or None. dropout_rate > 0 requires
    `rng` (a jax PRNG key); the same dropout pattern is regenerated in the
    backward pass from a scalar seed derived from it.
    """
    b, t, c = q.shape
    if blk_q < 128:
        raise ValueError(f"blk_q must be >= 128 (the lane-tile minimum), got {blk_q}")
    if c % n_heads != 0:
        raise ValueError(f"channels {c} not divisible by n_heads {n_heads}")
    # minimal-padding block selection (same rule as attention_pallas.py):
    # pad only to the 128 lane multiple, never to a larger block boundary —
    # at bucket lengths 300/600/800 a fixed 256 block wastes up to 1.78x of
    # the score-matrix FLOPs in BOTH directions
    t128 = -(-t // 128) * 128
    blk_q = next(cand for cand in (blk_q, 512, 256, 128) if cand <= blk_q and t128 % cand == 0)
    t_pad = -(-t // blk_q) * blk_q
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.ones((b, t), jnp.float32) if mask is None else mask.astype(jnp.float32)
    if t_pad != t:
        valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    if dropout_rate > 0.0:
        assert rng is not None, "dropout_rate > 0 requires an rng key"
        seed = jax.random.randint(rng, (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _attention_core(q, k, v, kbias, float(dropout_rate), n_heads, blk_q,
                          interpret, seed)
    return out[:, :t] if t_pad != t else out
