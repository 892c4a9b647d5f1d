"""Pallas TPU kernel for Monotonic Alignment Search.

Same DP as ops/mas.py (reference semantics: monotonic_align/core.py:14-47),
restructured for the hardware:

  * the full value table is never materialized — the forward pass streams
    neg_cent rows HBM -> VMEM (double-buffered DMA) and keeps only the
    previous accumulated row
  * the backtrace needs only the per-cell DECISION BIT
    d[y, x] = (value[y-1, x] < value[y-1, x-1]), stored as int8 in VMEM
    (Ty x B x Tx = ~12 MB at the training shape [32, 1000, 384])
  * the backtrace's per-batch gather d[b, index_b] is lane-hostile on TPU, so
    it runs as a one-hot multiply-reduce on the VPU; the same one-hot row is
    the path output row

Single kernel invocation, fori_loops inside (the DP is inherently sequential
over mel frames; a grid would not parallelize on a single-core chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mas_kernel(t_ys_ref, t_xs_ref, neg_ref, path_ref, prev_ref, curr_ref,
                dbits_ref, row_buf_ref, out_buf_ref, idx_ref, in_sems, out_sem):
    b, t_x = prev_ref.shape
    t_y = dbits_ref.shape[0]
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), 1)
    t_ys = t_ys_ref[...]  # [B, 1]
    t_xs = t_xs_ref[...]

    def in_dma(slot, y):
        # neg_ref is [Ty, B, Tx]: row slicing on the untiled major dim
        return pltpu.make_async_copy(
            neg_ref.at[y], row_buf_ref.at[slot], in_sems.at[slot]
        )

    # ---- forward: accumulate rows, record decision bits ----
    # zero-init the prev-row scratch: at y=0 both v_cur and shifted read it
    # (masked to -1e9/edge at x==0, but x>0 lanes feed dbits[0]); dbits[0]
    # can never change the path — the backtrace only uses it for the idx
    # update AFTER path row 0 is written — but uninitialized VMEM must not
    # reach any computed value (interpret-mode determinism, refactor safety)
    prev_ref[...] = jnp.zeros_like(prev_ref)
    in_dma(0, 0).start()

    def fwd_body(y, _):
        slot = jax.lax.rem(y, 2)

        @pl.when(y + 1 < t_y)
        def _():
            in_dma(1 - slot, y + 1).start()

        in_dma(slot, y).wait()
        raw = row_buf_ref[slot]
        prev = prev_ref[...]
        # shifted[x] = value[y-1, x-1]; x==0 -> (0 if y==0 else -inf)
        edge = jnp.where(y == 0, 0.0, -1e9)
        shifted = jnp.where(xs == 0, edge, pltpu.roll(prev, 1, 1))
        v_cur = jnp.where(xs == y, -1e9, prev)
        best = jnp.maximum(shifted, v_cur)
        lo = jnp.maximum(0, t_xs + y - t_ys)
        in_band = (xs >= lo) & (xs < jnp.minimum(t_xs, y + 1))
        curr_ref[...] = jnp.where(in_band, raw + best, raw)
        # decision bit: move left when value[y-1, x] < value[y-1, x-1]
        dbits_ref[y] = (v_cur < shifted).astype(jnp.int8)
        prev_ref[...] = curr_ref[...]
        return 0

    jax.lax.fori_loop(0, t_y, fwd_body, 0)

    # ---- backtrace ----
    idx_ref[...] = t_xs - 1  # [B, 1]

    def bwd_body(i, _):
        y = t_y - 1 - i
        out_sem_slot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            pltpu.make_async_copy(
                out_buf_ref.at[out_sem_slot], path_ref.at[y + 2],
                out_sem.at[out_sem_slot],
            ).wait()

        index = idx_ref[...]  # [B, 1]
        active = (y < t_ys).astype(jnp.float32)
        onehot = (xs == index).astype(jnp.float32) * active
        out_buf_ref[out_sem_slot] = onehot
        pltpu.make_async_copy(
            out_buf_ref.at[out_sem_slot], path_ref.at[y], out_sem.at[out_sem_slot]
        ).start()

        d_here = jnp.sum(
            dbits_ref[y].astype(jnp.float32) * (xs == index).astype(jnp.float32),
            axis=1, keepdims=True,
        )
        move = (index != 0) & ((index == y) | (d_here > 0)) & (y < t_ys)
        idx_ref[...] = index - move.astype(jnp.int32)
        return 0

    jax.lax.fori_loop(0, t_y, bwd_body, 0)
    # drain the last two output DMAs (row 0 started at i = t_y-1, row 1 at t_y-2)
    slot_y0 = (t_y - 1) % 2
    pltpu.make_async_copy(
        out_buf_ref.at[slot_y0], path_ref.at[0], out_sem.at[slot_y0]
    ).wait()
    if t_y > 1:
        slot_y1 = (t_y - 2) % 2
        pltpu.make_async_copy(
            out_buf_ref.at[slot_y1], path_ref.at[1], out_sem.at[slot_y1]
        ).wait()


def _round_up(n, m):
    return -(-n // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jnp.ndarray, mask: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in replacement for ops.mas.maximum_path on TPU.

    neg_cent: [B, Ty, Tx] log-likelihoods; mask: [B, Ty, Tx] validity.
    Returns the binary path [B, Ty, Tx] (float32).

    interpret=True runs under the Pallas TPU interpreter (CPU emulation of
    the DMA/semaphore semantics) so CI covers this kernel without hardware;
    tools/tpu_selftest.py (invoked by bench.py) validates the compiled
    version on the real chip.
    """
    b, t_y, t_x = neg_cent.shape
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)

    # lane/sublane alignment: Tx multiple of 128, B multiple of 8
    t_x_pad = _round_up(t_x, 128)
    b_pad = _round_up(b, 8)
    neg = neg_cent.astype(jnp.float32)
    if t_x_pad != t_x or b_pad != b:
        neg = jnp.pad(neg, ((0, b_pad - b), (0, 0), (0, t_x_pad - t_x)))
        t_ys = jnp.pad(t_ys, (0, b_pad - b), constant_values=1)
        t_xs = jnp.pad(t_xs, (0, b_pad - b), constant_values=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t_ys [B, 1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # t_xs [B, 1]
            pl.BlockSpec(memory_space=pltpu.ANY),   # neg_cent (HBM, row-streamed)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((b_pad, t_x_pad), jnp.float32),   # prev row
            pltpu.VMEM((b_pad, t_x_pad), jnp.float32),   # curr row
            pltpu.VMEM((t_y, b_pad, t_x_pad), jnp.int8),  # decision bits
            pltpu.VMEM((2, b_pad, t_x_pad), jnp.float32),  # input row double buffer
            pltpu.VMEM((2, b_pad, t_x_pad), jnp.float32),  # output row double buffer
            pltpu.VMEM((b_pad, 1), jnp.int32),            # backtrace index
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # [Ty, B, Tx] layout: per-row HBM slices stay tile-aligned
    neg_t = jnp.swapaxes(neg, 0, 1)
    path = pl.pallas_call(
        _mas_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_y, b_pad, t_x_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(t_ys[:, None], t_xs[:, None], neg_t)
    return jnp.swapaxes(path, 0, 1)[:b, :, :t_x]
