"""Round-5 attention-interior experiment: lane-filling by BATCH-pairing
(VERDICT r4 #5). Two batch elements per grid cell; per head, their [T,64]
q/k/v are stacked side-by-side ([T,128] queries) against block-diagonal
[2T,128] K/V so every MXU pass runs with full 128-lane contraction/output
width instead of the D=64 half-fill. Unlike round 4's head-pairing (which
hung the Mosaic compiler on the cross-head concat), the stacking here never
mixes head slices of the same row — each operand half comes from a
different grid-block row.

Arithmetic note: the block-diagonal zeros mean each 128-deep MAC does the
same useful work as two 64-deep MACs — the experiment tests whether the
systolic array's fixed per-pass overheads (weight-load latency, fewer
matmul issues) outweigh materializing the zero blocks.

Usage: python tools/attn_exp5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.nn.blocks import masked_sdpa
from stabletts_tpu.ops.attention_pallas import fused_attention_packed as v1
from stabletts_tpu.ops.mask import attn_bias_from_mask

B, T, H, D = 64, 1000, 4, 64
C = H * D
DTYPE = jnp.bfloat16
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _kernel_bpair(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    """Grid cell = 2 batch elements. q/k/v blocks [2, T, C]."""
    t_pad = q_ref.shape[1]
    scale = _LOG2E / math.sqrt(head_dim)
    b0 = bias_ref[0]  # [1, T]
    b1 = bias_ref[1]
    outs0, outs1 = [], []
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q0 = q_ref[0][:, sl]
        q1 = q_ref[1][:, sl]
        k0 = k_ref[0][:, sl]
        k1 = k_ref[1][:, sl]
        v0 = v_ref[0][:, sl]
        v1 = v_ref[1][:, sl]
        z = jnp.zeros((t_pad, head_dim), k0.dtype)
        qp = jnp.concatenate([q0, q1], axis=1)                      # [T, 128]
        kbd = jnp.concatenate(
            [jnp.concatenate([k0, z], axis=1),
             jnp.concatenate([z, k1], axis=1)], axis=0)             # [2T, 128]
        s = jax.lax.dot_general(
            qp, kbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                                    # [T, 2T]
        s0 = s[:, :t_pad] + b0
        s1 = s[:, t_pad:] + b1
        p0 = jnp.exp2(s0 - jnp.max(s0, axis=-1, keepdims=True))
        p1 = jnp.exp2(s1 - jnp.max(s1, axis=-1, keepdims=True))
        d0 = jnp.sum(p0, axis=-1, keepdims=True)
        d1 = jnp.sum(p1, axis=-1, keepdims=True)
        pp = jnp.concatenate([p0, p1], axis=1).astype(v0.dtype)      # [T, 2T]
        vbd = jnp.concatenate(
            [jnp.concatenate([v0, z], axis=1),
             jnp.concatenate([z, v1], axis=1)], axis=0)              # [2T, 128]
        o = jax.lax.dot_general(
            pp, vbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                            # [T, 128]
        outs0.append(o[:, :head_dim] / d0)
        outs1.append(o[:, head_dim:] / d1)
    o_ref[0] = jnp.concatenate(outs0, axis=-1).astype(o_ref.dtype)
    o_ref[1] = jnp.concatenate(outs1, axis=-1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def run_bpair(q, k, v, kbias):
    b, t_pad, c = q.shape
    spec2 = pl.BlockSpec((2, t_pad, c), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((2, 1, t_pad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_bpair, n_heads=H, head_dim=D),
        grid=(b // 2,),
        in_specs=[spec2, spec2, spec2, bspec],
        out_specs=spec2,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, kbias)


def main():
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    t_pad = 1024
    q = jax.random.normal(ks[0], (B, t_pad, C), DTYPE)
    k = jax.random.normal(ks[1], (B, t_pad, C), DTYPE)
    v = jax.random.normal(ks[2], (B, t_pad, C), DTYPE)
    mask = (jnp.arange(t_pad)[None, :] < T).astype(jnp.float32) * jnp.ones((B, 1))
    kbias = jnp.where(mask > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]

    ref = masked_sdpa(
        q.reshape(B, t_pad, H, D).astype(jnp.float32),
        k.reshape(B, t_pad, H, D).astype(jnp.float32),
        v.reshape(B, t_pad, H, D).astype(jnp.float32),
        attn_bias_from_mask(mask, dtype=jnp.float32),
    ).reshape(B, t_pad, C)
    mref = jnp.asarray(mask)[..., None]
    scale = float(jnp.abs(ref).max(where=mref > 0, initial=0.0))

    def check(got):
        return float(
            jnp.abs(got.astype(jnp.float32) - ref).max(where=mref > 0, initial=0.0)
        ) / scale

    base = jax.jit(lambda q_, k_, v_: v1(q_, k_, v_, mask, n_heads=H))
    got_base = base(q, k, v)
    got_pair = run_bpair(q, k, v, kbias)
    print(f"baseline packed-head kernel: {timeit(base, q, k, v):7.3f} ms  "
          f"rel_err={check(got_base):.2e}")
    print(f"batch-pair blockdiag kernel: {timeit(run_bpair, q, k, v, kbias):7.3f} ms  "
          f"rel_err={check(got_pair):.2e}")


if __name__ == "__main__":
    main()
