"""Convolution helpers with exact torch semantics where flax defaults differ."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv1d_same_dots(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """SAME-padded 1D conv as k shifted matmuls: y[t] = sum_j x[t+j-(k-1)//2] @ K[j].

    Numerically equivalent to lax.conv_general_dilated("NHC","HIO","NHC",
    padding=SAME) up to f32 accumulation order. Motivation: XLA lays out
    1D-conv operands T-minor ({1,2,0}) while the fused Pallas attention kernel
    is row-major ({2,1,0}) — with lax.conv the estimator hot loop flip-flops
    layouts around every FFN (~6.5% of inference device time in copies,
    measured on v5e at [32,1024,256->1024] bf16). Plain dots keep the whole
    loop row-major.

    MEASURED RESULT (v5e, B=32, T=1024): 4% slower end-to-end than lax.conv
    (2736 vs 2851 audio-s/s) — the k per-tap dot outputs are materialized in
    HBM before the shift/add combine, and that extra traffic exceeds the
    layout copies it removes. Kept as a documented negative result and for
    backends where conv support is weak; not wired into any model path.
    """
    k = kernel.shape[0]
    half = (k - 1) // 2  # XLA SAME pads lo=(k-1)//2, hi=k//2 (asymmetric for even k)
    y = x @ kernel[half]
    for j in range(k):
        off = j - half  # y[t] += (x @ K[j])[t + off]
        if off == 0:
            continue
        d = x @ kernel[j]
        if off > 0:
            y = y + jnp.pad(d[:, off:, :], ((0, 0), (0, off), (0, 0)))
        else:
            y = y + jnp.pad(d[:, :off, :], ((0, 0), (-off, 0), (0, 0)))
    return y + bias


def conv_transpose_1d(
    x: jnp.ndarray, kernel: jnp.ndarray, stride: int, padding: int, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """torch.nn.ConvTranspose1d equivalent on channels-last input.

    x: [B, T, C_in]; kernel: [k, C_in, C_out] (torch layout [C_in, C_out, k]
    transposed by the converter); output [B, (T-1)*stride - 2*padding + k, C_out].

    Implemented as the standard equivalence: dilate the input by `stride`,
    then run a regular convolution with the flipped kernel and padding
    (k - 1 - padding) — XLA lowers this to an MXU-friendly conv.
    """
    k = kernel.shape[0]
    flipped = jnp.flip(kernel, axis=0)  # [k, C_in, C_out]
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        rhs_dilation=(1,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias
    return out


def conv1d_dilated(
    x: jnp.ndarray, kernel: jnp.ndarray, dilation: int, padding: int, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Plain dilated 1D conv, channels-last. kernel: [k, C_in, C_out]."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    if bias is not None:
        out = out + bias
    return out
