"""Fused Pallas ISTFT head: iDFT matmul + overlap-add + envelope in one kernel.

Replaces the XLA pipeline istft_same_real (ops/istft.py) on TPU. Why: the XLA
path materializes the [B, T, n_fft] frame tensor in HBM between the iDFT
matmul and the overlap-add, and the OLA itself compiles to a reshape/copy/
slice-reduce chain measured ~8x off the bandwidth bound (3.3 ms at
[32, 1000, 2048] on v5e). Here the frames live only in VMEM: one grid cell
per batch element does the [T, n_fft+2] @ [n_fft+2, n_fft] matmul on the MXU,
overlap-adds r = win/hop shifted row-blocks on the VPU, multiplies by the
reciprocal window envelope, and writes the final waveform rows.

Requires win_length == n_fft and hop | win (the shipped Vocos config:
2048/512); the caller falls back to istft_same_real otherwise.

Numerics: identical to istft_same_real up to f32 summation order — the same
in-graph iDFT matrix (idft_matrix_windowed) and envelope are used, and the
matmul accumulates f32 (inputs optionally quantized to matmul_dtype exactly
like the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stabletts_tpu.ops.istft import hann_window, idft_matrix_windowed, window_envelope


def _istft_kernel(spec_ref, w_ref, envinv_ref, o_ref, *, hop: int, r: int):
    spec = spec_ref[0]  # [T, K]
    t = spec.shape[0]
    # f32 inputs: force true-f32 matmul passes (Mosaic's default quantizes
    # f32 dots through bf16, costing ~2e-3 parity vs the XLA path's
    # precision='float32'); bf16 inputs keep the fast single-pass path
    prec = jax.lax.Precision.HIGHEST if spec.dtype == jnp.float32 else None
    frames = jnp.dot(
        spec, w_ref[:], preferred_element_type=jnp.float32, precision=prec
    )  # [T, r*hop]
    chunks = frames.reshape(t, r, hop)
    out = None  # [T + r - 1, hop]: row i collects chunk j of frame i - j
    for j in range(r):
        padded = jnp.pad(chunks[:, j, :], ((j, r - 1 - j), (0, 0)))
        out = padded if out is None else out + padded
    o_ref[0] = (out * envinv_ref[:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "matmul_dtype", "interpret")
)
def istft_same_fused(
    re: jnp.ndarray, im: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
    matmul_dtype=None, interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for istft_same_real on TPU (win == n_fft, hop | win).

    re/im: [B, T, n_fft//2 + 1] -> waveform [B, T * hop_length].
    """
    if win_length != n_fft or n_fft % hop_length != 0:
        raise ValueError(
            f"istft_same_fused needs win == n_fft and hop | win "
            f"(got n_fft={n_fft}, win={win_length}, hop={hop_length})"
        )
    b, t, _ = re.shape
    r = n_fft // hop_length
    pad = (win_length - hop_length) // 2

    w_mat = idft_matrix_windowed(n_fft, win_length)
    spec = jnp.concatenate([re, im], axis=-1).astype(jnp.float32)
    if matmul_dtype is not None and matmul_dtype != jnp.float32:
        spec = spec.astype(matmul_dtype)
        w_mat = w_mat.astype(matmul_dtype)

    # true-length envelope; NOLA positivity over the kept interval is a
    # structural property of the hann window checked in tests
    window = hann_window(win_length)
    env = window_envelope(window, t, hop_length)  # [(t-1)*hop + win]
    envinv = jnp.asarray(
        (1.0 / np.maximum(env, 1e-11)).astype(np.float32).reshape(t + r - 1, hop_length)
    )

    t8 = -(-t // 8) * 8  # sublane alignment; zero rows add zero contributions
    if t8 != t:
        spec = jnp.pad(spec, ((0, 0), (0, t8 - t), (0, 0)))
        envinv = jnp.pad(envinv, ((0, t8 - t), (0, 0)))

    k = spec.shape[-1]
    full = lambda s: pl.BlockSpec(s, lambda bi: tuple(0 for _ in s), memory_space=pltpu.VMEM)
    rows = pl.pallas_call(
        functools.partial(_istft_kernel, hop=hop_length, r=r),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t8, k), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM),
            full((k, n_fft)),
            full((t8 + r - 1, hop_length)),
        ],
        out_specs=pl.BlockSpec(
            (1, t8 + r - 1, hop_length), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t8 + r - 1, hop_length), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t8 * k * n_fft,
            bytes_accessed=b * t8 * k * spec.dtype.itemsize + b * t8 * hop_length * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(spec, w_mat, envinv)

    flat = rows.reshape(b, (t8 + r - 1) * hop_length)
    return flat[:, pad : pad + t * hop_length]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def istft_same_fused_diff(re, im, n_fft, hop_length, win_length,
                          matmul_dtype=None, interpret=False):
    """istft_same_fused with a gradient: forward runs the fused Pallas kernel,
    backward is the transpose of the (linear) XLA ISTFT. This makes the fused
    head safe under jax.grad — GAN vocoder training can differentiate through
    model.apply even when the fused path is selected (the kernel itself has no
    VJP; ISTFT is linear in re/im so the XLA transpose is exact)."""
    return istft_same_fused(re, im, n_fft, hop_length, win_length,
                            matmul_dtype=matmul_dtype, interpret=interpret)


def _istft_fused_fwd(re, im, n_fft, hop_length, win_length, matmul_dtype,
                     interpret):
    out = istft_same_fused(re, im, n_fft, hop_length, win_length,
                           matmul_dtype=matmul_dtype, interpret=interpret)
    return out, (jax.ShapeDtypeStruct(re.shape, re.dtype),
                 jax.ShapeDtypeStruct(im.shape, im.dtype))


def _istft_fused_bwd(n_fft, hop_length, win_length, matmul_dtype, interpret,
                     res, g):
    from stabletts_tpu.ops.istft import istft_same_real

    re_spec, im_spec = res
    # backward stays f32 regardless of forward quantization: gradient noise
    # does not average away like forward quantization noise does
    lin = lambda re, im: istft_same_real(re, im, n_fft, hop_length, win_length)
    f32 = lambda s: jax.ShapeDtypeStruct(s.shape, jnp.float32)
    transpose = jax.linear_transpose(lin, f32(re_spec), f32(im_spec))
    dre, dim = transpose(g.astype(jnp.float32))
    return dre.astype(re_spec.dtype), dim.astype(im_spec.dtype)


istft_same_fused_diff.defvjp(_istft_fused_fwd, _istft_fused_bwd)
