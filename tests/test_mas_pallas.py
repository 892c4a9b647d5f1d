"""Pallas MAS kernel parity (runs on TPU only; the CPU suite exercises the
scan kernel via ops.mas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("cpu", "gpu"), reason="pallas TPU kernel needs a TPU"
)


def test_pallas_mas_matches_oracle():
    from stabletts_tpu.ops.mas import maximum_path_numpy
    from stabletts_tpu.ops.mas_pallas import maximum_path_pallas
    from stabletts_tpu.ops.mask import sequence_mask

    rng = np.random.default_rng(0)
    b, ty, tx = 8, 120, 48
    t_ys = rng.integers(tx, ty + 1, size=b).astype(np.int32)
    t_xs = np.minimum(rng.integers(2, tx + 1, size=b), t_ys).astype(np.int32)
    neg = rng.standard_normal((b, ty, tx)).astype(np.float32)
    mask = (
        np.asarray(sequence_mask(jnp.asarray(t_ys), ty))[:, :, None]
        * np.asarray(sequence_mask(jnp.asarray(t_xs), tx))[:, None, :]
    )
    expected = maximum_path_numpy(neg.copy(), t_ys, t_xs)
    got = np.asarray(maximum_path_pallas(jnp.asarray(neg), jnp.asarray(mask)))
    np.testing.assert_array_equal(got.astype(np.int32), expected)
