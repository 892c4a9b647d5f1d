"""Flash-style (online softmax, K-chunked) variant of the packed attention
kernel: shrink the score tile until it stays in VREGs, cutting the VMEM
spill traffic that attn_exp2 showed dominates (matmul-only == full kernel).
Static unroll over chunks; per-head accumulators [blk_q, D] f32."""

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

from stabletts_tpu.ops.attention_pallas import fused_attention_packed as v1

B, T, H, D = 64, 1000, 4, 64
C = H * D
DTYPE = jnp.bfloat16
_NEG = -0.7 * float(jnp.finfo(jnp.float32).max)
_LOG2E = math.log2(math.e)


def timeit(fn, *args, iters=100, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _k_flash(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim, kc):
    q = q_ref[0]      # [blk_q, C] pre-scaled by scale*log2e
    t_pad = k_ref.shape[1]
    n_chunks = t_pad // kc
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q[:, sl]
        m = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], head_dim), jnp.float32)
        for c in range(n_chunks):
            ks = k_ref[0, c * kc:(c + 1) * kc, sl]   # [kc, D]
            vs = v_ref[0, c * kc:(c + 1) * kc, sl]   # [kc, D]
            s = jax.lax.dot_general(
                qh, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [blk_q, kc]
            s = s + bias_ref[0, :, c * kc:(c + 1) * kc]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(
                p.astype(vs.dtype), vs, preferred_element_type=jnp.float32
            )
            m = m_new
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "kc"))
def run_flash(q, k, v, mask=None, blk_q=256, kc=256):
    b, t, c = q.shape
    head_dim = C // H
    scale = _LOG2E / math.sqrt(head_dim)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    t_pad = -(-t // max(blk_q, kc)) * max(blk_q, kc)
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.ones((b, t), jnp.float32)
    if t_pad != t:
        valid = jnp.pad(valid, ((0, 0), (0, t_pad - t)))
    if mask is not None:
        valid = valid * jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    grid = (b, t_pad // blk_q)
    return pl.pallas_call(
        functools.partial(_k_flash, n_heads=H, head_dim=head_dim, kc=kc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(q, k, v, kbias)[:, :t]


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, C), DTYPE)
    k = jax.random.normal(kk, (B, T, C), DTYPE)
    v = jax.random.normal(kv, (B, T, C), DTYPE)
    mask = jnp.ones((B, T), jnp.float32)

    refj = jax.jit(lambda q, k, v: v1(q, k, v, mask, n_heads=H))
    ref = refj(q, k, v)
    jax.block_until_ready(ref)

    def check(got):
        return float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        )

    print(f"  v1 baseline      {timeit(refj, q, k, v):7.3f} ms", flush=True)
    for blk_q, kc in [(256, 256), (128, 256), (256, 512), (512, 256), (128, 512), (512, 512)]:
        fn = jax.jit(lambda q, k, v, b=blk_q, c=kc: run_flash(q, k, v, blk_q=b, kc=c))
        got = fn(q, k, v)
        print(f"  flash q{blk_q:4d} k{kc:4d} {timeit(fn, q, k, v):7.3f} ms  rel_err={check(got):.2e}", flush=True)


if __name__ == "__main__":
    main()
