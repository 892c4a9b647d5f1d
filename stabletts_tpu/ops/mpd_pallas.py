"""Fused Pallas kernel for one MPD period discriminator's FULL conv stack.

The round-3 conclusion in docs/DESIGN.md ("GAN step profile") was that the
~108 ms/step GAN device floor is set by data movement around hundreds of
small convolutions, and that the only untried escape hatch is a hand-written
kernel that executes a whole discriminator stack per launch with
VMEM-resident activations. This file is that prototype (VERDICT r3 item #5),
for DiscriminatorP (reference: vocoders/vocos/models/discriminator.py:32-75):

    fold period p -> 5x (conv k=(5,1) stride (3,1) + leaky 0.1) -> conv_post

Design
------
- grid (B, p): one launch cell per (batch element, width stream) — the
  (5,1) kernels never mix the width dim, so each stream is an independent
  1-D conv stack.
- every activation lives in VMEM scratch shaped [ceil(C/128), L_pad, 128]
  (Mosaic strided loads require the base memref's last dim to be exactly
  128); only the fmaps the feature-matching loss needs go back to HBM.
- stride-3 convs read their im2col columns DIRECTLY with strided sublane
  loads (stride 3, tap offset k) — no stride-1 overcompute, no staging:
  y = sum_{k, chunk} strided_load(a[chunk], k) @ W[k, chunk] with every
  contraction a full 128 rows (weights chunk-padded with zero rows).
- Mosaic pitfalls found while building this (kept for the record):
  concatenating strided-load results or differently-offset slices fails
  with "offset mismatch on non-concat dimension"; strided loads are
  rejected unless the result row count is a multiple of 8 and the base
  memref is 128-lane. Hence: per-chunk accumulate, ceil8 row reads, and
  chunk-padded weights instead of concat/reshape tricks.

The prototype covers the forward pass; its measured result against the XLA
per-op stack (recorded in DESIGN.md) decides whether a custom-VJP rollout
is worth building.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHANNELS = (32, 128, 512, 1024, 1024)
_K = 5
_STRIDE = 3
_LEAK = 0.1


def _ceil8(n: int) -> int:
    return -(-n // 8) * 8


def _nchunks(c: int) -> int:
    return -(-c // 128)


def _layer_lens(l0: int) -> list:
    lens = [l0]
    cur = l0
    for _ in range(4):  # strided layers 0-3
        cur = -(-cur // _STRIDE)
        lens.append(cur)
    lens.append(cur)  # layer 4, stride 1
    lens.append(cur)  # conv_post, k=3 stride 1
    return lens


def _mpd_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, wp, bp,
                f1_ref, f2_ref, f3_ref, f4_ref, f5_ref,
                a0, a1, a2, a3, a4,
                *, l0: int):
    lens = _layer_lens(l0)
    leaky = lambda v: jnp.where(v >= 0, v, _LEAK * v)

    def zero(a, pad, l_valid):
        """Zero only the halo rows: [0, pad) and [pad + l_valid, rows).
        Garbage LANES need no zeroing — the chunk-padded weights have zero
        rows there, so they never contribute to a contraction."""
        rows = a.shape[1]
        dt = a.dtype
        for j in range(a.shape[0]):
            a[j, 0:pad, :] = jnp.zeros((pad, 128), dt)
            tail = rows - pad - l_valid
            a[j, pad + l_valid : rows, :] = jnp.zeros((tail, 128), dt)

    def store(a, y, l_out):
        """y [l8(+), c_out] -> chunked scratch rows [pad, pad + l_out)."""
        c_out = y.shape[1]
        for j in range(a.shape[0]):
            cw = min(128, c_out - j * 128)
            if cw < 128:
                a[j, _K // 2 : _K // 2 + l_out, :] = jnp.pad(
                    y[:l_out, j * 128 : j * 128 + cw], ((0, 0), (0, 128 - cw))
                ).astype(a.dtype)
            else:
                a[j, _K // 2 : _K // 2 + l_out, :] = (
                    y[:l_out, j * 128 : j * 128 + cw].astype(a.dtype)
                )

    # layer 0 runs on the XLA side (1-channel input would waste 127/128
    # contraction lanes here); its activation arrives as the kernel input
    zero(a0, _K // 2, lens[1])
    a0[0, _K // 2 : _K // 2 + lens[1], :] = jnp.pad(
        x_ref[0, 0, :, :], ((0, 0), (0, 96))
    ).astype(a0.dtype)

    def conv(a, w_ref, b_ref, l_out, k, stride):
        """strided conv from chunked scratch a; weights [k*nc*128, c_out]
        chunk-padded; returns pre-activation [ceil8(l_out), c_out] f32."""
        nc = a.shape[0]
        l8 = _ceil8(l_out)
        y = jnp.broadcast_to(b_ref[...], (l8, b_ref.shape[1])).astype(jnp.float32)
        for kk in range(k):
            for j in range(nc):
                if stride == 3:
                    xs = a[j, kk : kk + 3 * l8 : 3, :]
                else:
                    xs = a[j, kk : kk + l8, :]
                w_rows = w_ref[(kk * nc + j) * 128 : (kk * nc + j + 1) * 128, :]
                y = y + jnp.dot(xs, w_rows, preferred_element_type=jnp.float32)
        return y

    scratches = [a0, a1, a2, a3, a4]
    weights = [(w1, b1), (w2, b2), (w3, b3), (w4, b4)]
    fmaps = [f1_ref, f2_ref, f3_ref, f4_ref]
    for idx, (w, b) in enumerate(weights):
        i = idx + 1
        l_out = lens[i + 1]
        stride = 3 if i < 4 else 1
        y = leaky(conv(scratches[i - 1], w, b, l_out, _K, stride))
        c_out = y.shape[1]
        for j in range(_nchunks(c_out)):
            cw = min(128, c_out - j * 128)
            fmaps[idx][0, 0, :, j * 128 : j * 128 + cw] = (
                y[:, j * 128 : j * 128 + cw]
            )
        if i < 4:
            nxt = scratches[i]
            zero(nxt, _K // 2, l_out)
            store(nxt, y, l_out)
        else:
            # conv_post input: restage layer 4's output (k=3 -> pad 1)
            zero(a4, 1, l_out)
            c_out = y.shape[1]
            for j in range(_nchunks(c_out)):
                a4[j, 1 : 1 + l_out, :] = y[:l_out, j * 128 : (j + 1) * 128].astype(a4.dtype)

    yp = conv(a4, wp, bp, lens[6], 3, 1)
    f5_ref[0, 0, :, :] = yp


@functools.partial(jax.jit, static_argnames=("period", "interpret"))
def mpd_stack_fused(x, params, period: int = 2, interpret: bool = False):
    """x: [B, T] audio; params: DiscriminatorP flax params with weight-norm
    already folded (convs_0..convs_4, conv_post with plain kernel/bias).

    Returns (logits [B, p*L5], fmaps) matching models/discriminators.py
    DiscriminatorP output structure (fmaps in [B, L, p, C] NHWC order).
    """
    b, t = x.shape
    if t % period:
        x = jnp.pad(x, ((0, 0), (0, period - t % period)), mode="reflect")
        t = x.shape[1]
    l0 = t // period
    lens = _layer_lens(l0)

    # layer 0 in XLA: [B, L, p, 1] -> conv (5,1)/(3,1) -> [B, l1, p, 32],
    # then [B, p, l1, 32] for the kernel
    h = x.reshape(b, l0, period, 1)
    k0 = params["convs_0"]["kernel"].astype(jnp.float32)
    b0 = params["convs_0"]["bias"].astype(jnp.float32)
    h = jax.lax.conv_general_dilated(
        h.astype(jnp.float32), k0, (3, 1), ((2, 2), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b0
    h = jnp.where(h >= 0, h, _LEAK * h)
    xs = jnp.swapaxes(h, 1, 2)  # [B, p, l1, 32]

    def prep(kern, bias, k):
        """[k, 1, cin, cout] -> chunk-padded [k * nc * 128, cout] f32."""
        kern = kern.reshape(k, -1, kern.shape[-1]).astype(jnp.float32)
        _, cin, cout = kern.shape
        nc = _nchunks(cin)
        pad = nc * 128 - cin
        if pad:
            kern = jnp.pad(kern, ((0, 0), (0, pad), (0, 0)))
        return kern.reshape(k * nc * 128, cout), bias.astype(jnp.float32)[None, :]

    ws = [prep(params[f"convs_{i}"]["kernel"], params[f"convs_{i}"]["bias"], _K)
          for i in range(1, 5)]
    wp, bp = prep(params["conv_post"]["kernel"], params["conv_post"]["bias"], 3)

    grid = (b, period)
    wspec = lambda a: pl.BlockSpec(a.shape, lambda bi, wi: tuple(0 for _ in a.shape),
                                   memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((b, period, _ceil8(lens[i + 1]), c), jnp.float32)
        for i, c in [(1, 128), (2, 512), (3, 1024), (4, 1024)]
    ] + [jax.ShapeDtypeStruct((b, period, _ceil8(lens[6]), 1), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, s.shape[2], s.shape[3]),
                     lambda bi, wi: (bi, wi, 0, 0), memory_space=pltpu.VMEM)
        for s in out_shapes
    ]
    # chunked activations [nc, rows, 128]: a_i holds layer i's OUTPUT
    # (length lens[i+1], channels _CHANNELS[i]); rows must cover both the
    # padded write and the next layer's strided reads
    # kk : kk + 3*ceil8(lens[i+2]) : 3, kk < K
    scratch = [
        pltpu.VMEM((1, 3 * _ceil8(lens[2]) + 2 * _K, 128), jnp.float32),
        pltpu.VMEM((1, 3 * _ceil8(lens[3]) + 2 * _K, 128), jnp.float32),
        pltpu.VMEM((4, 3 * _ceil8(lens[4]) + 2 * _K, 128), jnp.float32),
        pltpu.VMEM((8, _ceil8(lens[5]) + 2 * _K, 128), jnp.float32),
        pltpu.VMEM((8, _ceil8(lens[6]) + 2 * _K, 128), jnp.float32),
    ]
    inputs = [xs]  # [B, p, l1, 32]
    in_specs = [pl.BlockSpec((1, 1, lens[1], 32), lambda bi, wi: (bi, wi, 0, 0),
                             memory_space=pltpu.VMEM)]
    for w, bias in ws:
        inputs += [w, bias]
        in_specs += [wspec(w), wspec(bias)]
    inputs += [wp, bp]
    in_specs += [wspec(wp), wspec(bp)]

    outs = pl.pallas_call(
        functools.partial(_mpd_kernel, l0=l0),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*inputs)

    # [B, p, l8, C] -> unpad rows -> [B, L, p, C] NHWC like DiscriminatorP
    lens_out = [lens[2], lens[3], lens[4], lens[5], lens[6]]
    fmaps = [jnp.swapaxes(o[:, :, :l, :], 1, 2) for o, l in zip(outs, lens_out)]
    logits = fmaps[-1].reshape(b, -1)
    return logits, fmaps
