"""One-off attention kernel experiments (block sizes, head batching)."""

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
from stabletts_tpu.ops.attention_pallas_v2 import fused_attention_packed as v2

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


# --- head-pair blockdiag variant -------------------------------------------
def _kernel_pair(q_ref, k_ref, v_ref, bias_ref, o_ref, *, n_heads, head_dim):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    t_pad = k.shape[0]
    bias = bias_ref[0]  # [1, T]
    bias2 = jnp.concatenate([bias, bias], axis=-1)  # [1, 2T]
    for hp in range(n_heads // 2):
        sl = slice(hp * 2 * head_dim, (hp + 1) * 2 * head_dim)  # 128 cols
        q2 = q[:, sl]  # [blk, 128]
        k2 = k[:, sl]  # [T, 128]
        # block-diagonal K: [128, 2T] so one matmul yields both heads' scores
        z = jnp.zeros((t_pad, head_dim), k.dtype)
        kbd = jnp.concatenate(
            [
                jnp.concatenate([k2[:, :head_dim], z], axis=-1),   # rows for cols 0:T
                jnp.concatenate([z, k2[:, head_dim:]], axis=-1),   # rows for cols T:2T
            ],
            axis=0,
        )  # [2T, 128]
        s = jax.lax.dot_general(
            q2, kbd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [blk, 2T]
        s = s + bias2
        s3 = s.reshape(s.shape[0], 2, t_pad)
        m = jnp.max(s3, axis=-1, keepdims=True)
        w = jnp.exp2(s3 - m)
        denom = jnp.sum(w, axis=-1, keepdims=True)
        w = (w / denom).astype(v.dtype).reshape(s.shape[0], 2 * t_pad)
        # stacked V: [2T, 128] — rows 0:T carry head0 in cols 0:64, rows T:2T head1
        vs = jnp.concatenate(
            [
                jnp.concatenate([v[:, sl][:, :head_dim], z], axis=-1),
                jnp.concatenate([z, v[:, sl][:, head_dim:]], axis=-1),
            ],
            axis=0,
        )
        o_ref[0, :, sl] = jnp.dot(
            w, vs, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("blk_q", "impl"))
def run_pair(q, k, v, blk_q=512, impl=_kernel_pair):
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
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v, kbias)[:, :t]


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, C), DTYPE)
    k = jax.random.normal(kk, (B, T, C), DTYPE)
    v = jax.random.normal(kv, (B, T, C), DTYPE)
    mask = jnp.ones((B, T), jnp.float32)

    print("compiling ref...", flush=True)
    ref = jax.jit(lambda q, k, v: v1(q, k, v, mask, n_heads=H))(q, k, v)
    jax.block_until_ready(ref)
    print("ref done", flush=True)

    def check(got):
        return float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        )

    for name, fn in [
        ("v1 blk512", jax.jit(lambda q, k, v: v1(q, k, v, mask, n_heads=H, blk_q=512))),
        ("v2 blk512", jax.jit(lambda q, k, v: v2(q, k, v, mask, n_heads=H, blk_q=512))),
        ("v2 blk1024", jax.jit(lambda q, k, v: v2(q, k, v, mask, n_heads=H, blk_q=1024))),
        ("v2 blk256", jax.jit(lambda q, k, v: v2(q, k, v, mask, n_heads=H, blk_q=256))),
        ("pair blk512", jax.jit(lambda q, k, v: run_pair(q, k, v, blk_q=512))),
        ("pair blk1024", jax.jit(lambda q, k, v: run_pair(q, k, v, blk_q=1024))),
    ]:
        try:
            print(f"  compiling {name}...", flush=True)
            got = fn(q, k, v)
            print(f"  {name:14s} {timeit(fn, q, k, v):7.3f} ms  rel_err={check(got):.2e}")
        except Exception as e:
            print(f"  {name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
