"""LR schedules. The reference uses transformers-style cosine-with-warmup
(reference: utils/scheduler.py:118, train.py:61); optax expresses the same
curve directly. The other reference schedule variants are provided for
completeness (utils/scheduler.py offers constant/linear/cosine/
cosine-restarts/polynomial/inverse-sqrt/WSD)."""

from __future__ import annotations

import math

import optax


def cosine_with_warmup(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    """Linear warmup 0 -> lr, then cosine decay lr -> 0
    (reference: utils/scheduler.py:96-124)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def constant_with_warmup(lr: float, warmup_steps: int) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        return lr * jnp.minimum(step / jnp.maximum(warmup_steps, 1), 1.0)

    return schedule


def linear_with_warmup(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.maximum(
            0.0, (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1)
        )
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def inverse_sqrt_with_warmup(lr: float, warmup_steps: int) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.sqrt(warmup_steps / jnp.maximum(step, warmup_steps))
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule
