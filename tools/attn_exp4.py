"""Does pre-transposing K (so QK^T needs no in-kernel transpose) speed up
the packed attention kernel? K arrives as [B, C, T_pad] (head-major rows)."""

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


def timeit(fn, *args, iters=200, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _k_kt(q_ref, kt_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q = q_ref[0]    # [blk_q, C] pre-scaled
    kt = kt_ref[0]  # [C, T_pad]
    v = v_ref[0]    # [T_pad, C]
    bias = bias_ref[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(
            q[:, sl], kt[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [blk_q, T_pad] — natural [M,K]x[K,N], no transpose
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp2(s - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (wv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q",))
def run_kt(q, kt, v, blk_q=512):
    b, t, c = q.shape
    head_dim = C // H
    scale = _LOG2E / math.sqrt(head_dim)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    t_pad = -(-t // blk_q) * blk_q
    if t_pad != t:
        q = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, t_pad - t)))
        v = jnp.pad(v, ((0, 0), (0, t_pad - t), (0, 0)))
    valid = jnp.pad(jnp.ones((b, t), jnp.float32), ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    grid = (b, t_pad // blk_q)
    return pl.pallas_call(
        functools.partial(_k_kt, n_heads=H, head_dim=head_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, t_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, c), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, c), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(q, kt, v, kbias)[:, :t]


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

    kt = jnp.swapaxes(k, 1, 2)

    fn_inner = jax.jit(lambda q, kt, v: run_kt(q, kt, v))
    got = fn_inner(q, kt, v)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
                / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))
    fn_e2e = jax.jit(lambda q, k, v: run_kt(q, jnp.swapaxes(k, 1, 2), v))

    print(f"  v1 baseline           {timeit(refj, q, k, v):7.3f} ms", flush=True)
    print(f"  kT kernel (pre-T'd)   {timeit(fn_inner, q, kt, v):7.3f} ms  rel_err={err:.2e}", flush=True)
    print(f"  kT kernel + transpose {timeit(fn_e2e, q, k, v):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
