"""Convolution helpers with exact torch semantics where flax defaults differ."""

from __future__ import annotations

import jax
import jax.numpy as jnp


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
