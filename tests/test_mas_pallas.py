"""Pallas MAS kernel parity vs the numpy DP oracle (reference semantics:
monotonic_align/core.py:14-47).

On CPU the kernel runs under the Pallas TPU interpreter (interpret=True),
which emulates the kernel's DMA/semaphore double-buffering — so CI exercises
the real kernel logic without hardware. On a real TPU the same tests run the
compiled kernel. tools/tpu_selftest.py (invoked by bench.py) additionally
validates the compiled kernel on-chip every bench run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stabletts_tpu.ops.mas import maximum_path_numpy
from stabletts_tpu.ops.mas_pallas import maximum_path_pallas
from stabletts_tpu.ops.mask import sequence_mask

INTERPRET = jax.default_backend() != "tpu"


def _case(b, ty, tx, seed=0):
    rng = np.random.default_rng(seed)
    t_ys = rng.integers(max(tx, 2), ty + 1, size=b).astype(np.int32)
    t_xs = np.minimum(rng.integers(2, tx + 1, size=b), t_ys).astype(np.int32)
    neg = rng.standard_normal((b, ty, tx)).astype(np.float32)
    mask = (
        np.asarray(sequence_mask(jnp.asarray(t_ys), ty))[:, :, None]
        * np.asarray(sequence_mask(jnp.asarray(t_xs), tx))[:, None, :]
    )
    return neg, mask, t_ys, t_xs


def test_pallas_mas_matches_oracle():
    b, ty, tx = (8, 120, 48) if INTERPRET else (8, 120, 48)
    neg, mask, t_ys, t_xs = _case(b, ty, tx)
    expected = maximum_path_numpy(neg.copy(), t_ys, t_xs)
    got = np.asarray(
        maximum_path_pallas(jnp.asarray(neg), jnp.asarray(mask), interpret=INTERPRET)
    )
    np.testing.assert_array_equal(got.astype(np.int32), expected)


def test_pallas_mas_ragged_and_degenerate_lengths():
    # exercises the padding path (B not multiple of 8, Tx not multiple of 128)
    # and t_x == 1 / t_y == t_x degenerate items
    b, ty, tx = 5, 40, 20
    neg, mask, t_ys, t_xs = _case(b, ty, tx, seed=3)
    t_xs[0] = 1
    t_ys[1] = t_xs[1]
    m0 = np.asarray(sequence_mask(jnp.asarray(t_ys), ty))[:, :, None]
    m1 = np.asarray(sequence_mask(jnp.asarray(t_xs), tx))[:, None, :]
    mask = m0 * m1
    expected = maximum_path_numpy(neg.copy(), t_ys, t_xs)
    got = np.asarray(
        maximum_path_pallas(jnp.asarray(neg), jnp.asarray(mask), interpret=INTERPRET)
    )
    np.testing.assert_array_equal(got.astype(np.int32), expected)


@pytest.mark.skipif(INTERPRET, reason="timing irrelevant under the interpreter")
def test_pallas_mas_faster_than_scan_on_tpu():
    import time

    from stabletts_tpu.ops.mas import maximum_path

    neg, mask, *_ = _case(16, 400, 128, seed=1)
    negj, maskj = jnp.asarray(neg), jnp.asarray(mask)
    f_pallas = jax.jit(maximum_path_pallas)
    f_scan = jax.jit(maximum_path)
    np.testing.assert_array_equal(
        np.asarray(f_pallas(negj, maskj)), np.asarray(f_scan(negj, maskj))
    )

    def timeit(f):
        t0 = time.time()
        outs = [f(negj, maskj) for _ in range(10)]
        float(outs[-1].sum())
        return (time.time() - t0) / 10

    assert timeit(f_pallas) < timeit(f_scan)
