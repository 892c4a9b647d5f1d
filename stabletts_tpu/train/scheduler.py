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
    # transformers' inverse_sqrt falls back to timescale=10000 when
    # num_warmup_steps=0; without it step 0 evaluates sqrt(0/0)=NaN (both
    # jnp.where branches are computed) and every later step decays to lr*0
    timescale = warmup_steps if warmup_steps > 0 else 10_000

    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        decay = jnp.sqrt(timescale / jnp.maximum(step, timescale))
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def cosine_with_restarts_warmup(
    lr: float, warmup_steps: int, total_steps: int, num_cycles: int = 1
) -> optax.Schedule:
    """Hard-restart cosine (reference: utils/scheduler.py cosine-with-restarts)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        progress = jnp.clip(
            (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cyc = (progress * num_cycles) % 1.0
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cyc)))
        decay = jnp.where(progress >= 1.0, 0.0, cos)
        return lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def polynomial_with_warmup(
    lr: float, warmup_steps: int, total_steps: int, lr_end: float = 1e-7, power: float = 1.0
) -> optax.Schedule:
    """Polynomial decay lr -> lr_end (reference: utils/scheduler.py polynomial)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        remaining = jnp.clip(
            1.0 - (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        decay = (lr - lr_end) * remaining ** power + lr_end
        return jnp.where(step < warmup_steps, lr * warm, jnp.where(step > total_steps, lr_end, decay))

    return schedule


def warmup_stable_decay(
    lr: float, warmup_steps: int, total_steps: int, decay_fraction: float = 0.1
) -> optax.Schedule:
    """WSD: warmup -> constant -> linear decay over the final fraction
    (reference: utils/scheduler.py WSD)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = step / jnp.maximum(warmup_steps, 1)
        decay_steps = decay_fraction * total_steps
        decay_start = total_steps - decay_steps
        decay = jnp.clip((total_steps - step) / jnp.maximum(decay_steps, 1), 0.0, 1.0)
        stable = jnp.where(step >= decay_start, decay, 1.0)
        return lr * jnp.where(step < warmup_steps, warm, stable)

    return schedule
