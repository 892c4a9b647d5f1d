"""Monotonic Alignment Search (MAS) — device-native DP kernel.

The reference implements MAS as a numba-JIT CPU kernel and pays a
GPU->CPU->GPU round-trip on every training step (reference:
monotonic_align/__init__.py:7-16, monotonic_align/core.py:14-47). Here the same
Viterbi-style DP runs fully on-device as a `lax.scan` over mel frames with the
whole batch vectorized per step, so the alignment never leaves HBM and the
train step stays a single XLA computation.

Semantics replicated exactly (incl. band restriction and tie-breaking):

  forward, for y in [0, t_y):
    for x in [max(0, t_x + y - t_y), min(t_x, y + 1)):
      v_cur  = -1e9            if x == y else value[y-1, x]
      v_prev = (0 if y == 0 else -1e9) if x == 0 else value[y-1, x-1]
      value[y, x] += max(v_prev, v_cur)
  backtrace, from index = t_x - 1, for y in (t_y-1 .. 0]:
    path[y, index] = 1
    if index != 0 and (index == y or value[y-1, index] < value[y-1, index-1]):
      index -= 1

Cells outside the band keep their raw (unaccumulated) neg_cent value, and the
backtrace's `value[-1, :]` read at y == 0 wraps around (numpy semantics); both
quirks are reproduced so results match the reference bit-for-bit.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

_MAX_NEG = -1e9


def _forward_rows(neg_cent: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray) -> jnp.ndarray:
    """Accumulate the DP table. [B, Ty, Tx] -> [B, Ty, Tx] accumulated values."""
    b, t_y_max, t_x_max = neg_cent.shape
    xs = jnp.arange(t_x_max)

    def step(prev_row, inputs):
        y, raw_row = inputs  # scalar, [B, Tx]
        v_cur = jnp.where(xs[None, :] == y, _MAX_NEG, prev_row)
        shifted = jnp.concatenate(
            [jnp.full((b, 1), jnp.where(y == 0, 0.0, _MAX_NEG), dtype=prev_row.dtype), prev_row[:, :-1]],
            axis=1,
        )
        v_prev = shifted
        lo = jnp.maximum(0, t_xs[:, None] + y - t_ys[:, None])  # [B, 1]
        hi = jnp.minimum(t_xs[:, None], y + 1)
        in_band = (xs[None, :] >= lo) & (xs[None, :] < hi)
        row = jnp.where(in_band, raw_row + jnp.maximum(v_prev, v_cur), raw_row)
        return row, row

    init = jnp.zeros((b, t_x_max), dtype=neg_cent.dtype)
    ys = jnp.arange(t_y_max)
    _, rows = jax.lax.scan(step, init, (ys, jnp.swapaxes(neg_cent, 0, 1)))
    return jnp.swapaxes(rows, 0, 1)  # [B, Ty, Tx]


def _backtrace(value: jnp.ndarray, t_ys: jnp.ndarray, t_xs: jnp.ndarray) -> jnp.ndarray:
    """Argmax backtrace over the accumulated table -> binary path [B, Ty, Tx]."""
    b, t_y_max, t_x_max = value.shape
    batch = jnp.arange(b)

    def step(index, y):
        active = y < t_ys  # rows >= t_y are untouched (stay zero)
        path_row = (jax.nn.one_hot(index, t_x_max, dtype=value.dtype)) * active[:, None].astype(value.dtype)
        # value[y-1, :] with numpy wrap-around at y == 0 (benign: index == 0 there)
        prev = value[batch, (y - 1) % t_y_max, :]  # [B, Tx]
        a = prev[batch, index]
        bb = prev[batch, jnp.maximum(index - 1, 0)]
        move = (index != 0) & ((index == y) | (a < bb)) & active
        return index - move.astype(index.dtype), path_row

    init = t_xs - 1
    ys = jnp.arange(t_y_max - 1, -1, -1)
    _, rows = jax.lax.scan(step, init, ys)
    return jnp.swapaxes(rows, 0, 1)[:, ::-1, :]  # emitted Ty-1..0 -> reorder to 0..Ty-1


@jax.jit
def maximum_path(neg_cent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Batched MAS. neg_cent: [B, Ty, Tx] log-likelihoods, mask: [B, Ty, Tx].

    Returns a binary monotonic path [B, Ty, Tx] maximizing the path sum,
    matching reference monotonic_align.maximum_path (monotonic_align/__init__.py:7-16).
    """
    neg_cent = neg_cent.astype(jnp.float32)
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    value = _forward_rows(neg_cent, t_ys, t_xs)
    return _backtrace(value, t_ys, t_xs)


_logged_fallback_shapes: set = set()


def maximum_path_auto(neg_cent: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Dispatch to the Pallas kernel on TPU when its VMEM working set fits
    (decision-bit table + row buffers), else the lax.scan kernel. The Pallas
    kernel measures ~2.2x faster at the training shape [32, 1000, 384]."""
    b, t_y, t_x = neg_cent.shape
    b_pad = -(-b // 8) * 8
    t_x_pad = -(-t_x // 128) * 128
    vmem_bytes = t_y * b_pad * t_x_pad + 6 * b_pad * t_x_pad * 4
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if on_tpu and vmem_bytes < 13 * 2 ** 20:
        from stabletts_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(neg_cent, mask)
    if on_tpu and (b, t_y, t_x) not in _logged_fallback_shapes:
        # once per shape: a config that quietly overflows the Pallas VMEM
        # budget loses the ~2.2x kernel without any signal otherwise
        _logged_fallback_shapes.add((b, t_y, t_x))
        logging.getLogger("stabletts.ops.mas").warning(
            "MAS [%d, %d, %d] exceeds the Pallas VMEM budget (%.1f MiB >= 13 "
            "MiB); using the ~2.2x slower lax.scan kernel for this shape",
            b, t_y, t_x, vmem_bytes / 2 ** 20,
        )
    return maximum_path(neg_cent, mask)


def maximum_path_numpy(neg_cent: np.ndarray, t_ys: np.ndarray, t_xs: np.ndarray) -> np.ndarray:
    """Pure-numpy oracle with the reference kernel's exact semantics (for tests)."""
    b, t_y_max, t_x_max = neg_cent.shape
    paths = np.zeros((b, t_y_max, t_x_max), dtype=np.int32)
    values = neg_cent.astype(np.float32).copy()
    for i in range(b):
        value = values[i]
        path = paths[i]
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = _MAX_NEG if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else _MAX_NEG
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            path[y, index] = 1
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths
