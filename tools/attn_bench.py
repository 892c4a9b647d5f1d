"""Microbenchmark for the DiT attention hot path on the real TPU.

Times (amortized over many calls, single tail readback):
  rope      — packed-layout RoPE (cos/sin mul + signed-perm matmul) alone
  kernel    — fused_attention_packed alone (post-rope inputs)
  rope+kern — the two chained as MultiHeadAttention runs them today
  variants  — experimental kernels toggled by name on argv

Usage: python tools/attn_bench.py [B T] [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from stabletts_tpu.nn.blocks import _rope_neg_half_matrix, _rope_packed_cache
from stabletts_tpu.ops.attention_pallas import fused_attention_packed

B = int(sys.argv[1]) if len(sys.argv) > 2 else 64
T = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
H, D = 4, 64
C = H * D
DTYPE = jnp.bfloat16


def timeit(fn, *args, iters=200, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, T, C), DTYPE)
    k = jax.random.normal(kk, (B, T, C), DTYPE)
    v = jax.random.normal(kv, (B, T, C), DTYPE)
    mask = jnp.ones((B, T), jnp.float32)

    cosv, sinv = _rope_packed_cache(T, H, D, D // 2, DTYPE)
    perm = _rope_neg_half_matrix(H, D, D // 2).astype(DTYPE)

    @jax.jit
    def rope_only(q, k):
        qr = q * cosv[None] + (q @ perm) * sinv[None]
        kr = k * cosv[None] + (k @ perm) * sinv[None]
        return qr, kr

    @jax.jit
    def kernel_only(q, k, v):
        return fused_attention_packed(q, k, v, mask, n_heads=H)

    @jax.jit
    def chained(q, k, v):
        qr, kr = rope_only(q, k)
        return fused_attention_packed(qr, kr, v, mask, n_heads=H)

    print(f"shape [B={B}, T={T}, H={H}, D={D}] {DTYPE.__name__}")
    print(f"  rope only      {timeit(rope_only, q, k):7.3f} ms")
    print(f"  kernel only    {timeit(kernel_only, q, k, v):7.3f} ms")
    print(f"  rope + kernel  {timeit(chained, q, k, v):7.3f} ms")

    # attention matmul FLOPs (QK^T + PV) for utilization math
    flops = 4 * B * H * T * T * D
    ms = timeit(kernel_only, q, k, v)
    print(f"  kernel matmul util vs 394 TF/s bf16 peak: "
          f"{flops / (ms * 1e-3) / 394e12 * 100:.1f}%")

    for name in sys.argv[3:]:
        mod = __import__(f"stabletts_tpu.ops.{name}", fromlist=[name])
        fn = jax.jit(
            lambda q, k, v, f=mod.fused_attention_packed: f(q, k, v, mask, n_heads=H)
        )
        ref = kernel_only(q, k, v)
        got = fn(q, k, v)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
            / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9)
        )
        print(f"  {name:22s} {timeit(fn, q, k, v):7.3f} ms   rel_err={err:.2e}")


if __name__ == "__main__":
    main()
