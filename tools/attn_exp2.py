"""Decompose fused-attention kernel time: matmul-only / no-max / bf16-score
variants, all structurally v2-like (no compile-hanging concatenates)."""

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


def _k_matmul_only(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = jnp.dot(s.astype(v.dtype), v[:, sl],
                                  preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _k_nomax(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    bias = bias_ref[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        w = jnp.exp2(s + bias)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        wv = jnp.dot(w.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (wv / denom).astype(o_ref.dtype)


def _k_bf16score(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    bias = bias_ref[0].astype(jnp.bfloat16)
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.bfloat16)
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        w = jnp.exp2((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
        denom = jnp.sum(w.astype(jnp.float32), axis=-1, keepdims=True)
        wv = jnp.dot(w, v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (wv / denom).astype(o_ref.dtype)


def _k_nomax_bf16(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    bias = bias_ref[0]
    for h in range(n_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        s = jax.lax.dot_general(q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        w32 = jnp.exp2(s + bias)
        denom = jnp.sum(w32, axis=-1, keepdims=True)
        wv = jnp.dot(w32.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (wv / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "which"))
def run(q, k, v, blk_q=512, which="nomax"):
    impl = {"matmul": _k_matmul_only, "nomax": _k_nomax,
            "bf16": _k_bf16score, "nomax_bf16": _k_nomax_bf16}[which]
    b, t, c = q.shape
    head_dim = C // H
    scale = _LOG2E / math.sqrt(head_dim)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    t_pad = -(-t // blk_q) * blk_q
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    valid = jnp.pad(jnp.ones((b, t), jnp.float32), ((0, 0), (0, t_pad - t)))
    kbias = jnp.where(valid > 0, 0.0, _NEG).astype(jnp.float32)[:, None, :]
    grid = (b, t_pad // blk_q)
    return pl.pallas_call(
        functools.partial(impl, n_heads=H, head_dim=head_dim),
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

    ref = jax.jit(lambda q, k, v: v1(q, k, v, mask, n_heads=H))(q, k, v)
    jax.block_until_ready(ref)

    def check(got):
        return float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        )

    print(f"  v1 baseline    {timeit(jax.jit(lambda q,k,v: v1(q,k,v,mask,n_heads=H)), q, k, v):7.3f} ms", flush=True)
    for which in ["matmul", "nomax", "nomax_bf16", "bf16"]:
        fn = jax.jit(lambda q, k, v, w=which: run(q, k, v, which=w))
        got = fn(q, k, v)
        err = "n/a" if which == "matmul" else f"{check(got):.2e}"
        print(f"  {which:14s} {timeit(fn, q, k, v):7.3f} ms  rel_err={err}", flush=True)


if __name__ == "__main__":
    main()
