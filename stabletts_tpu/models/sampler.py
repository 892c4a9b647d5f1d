"""Jit-compiled synthesis pipeline: text -> mel via flow-matching ODE.

The ODE integration lives here, outside the flax module, so `lax.scan` traces
the estimator exactly once per solver stage — one compiled block regardless of
step count (the TPU replacement for torchdiffeq's Python-loop odeint,
reference: models/flow_matching.py:25-67).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stabletts_tpu.models.stabletts import StableTTS
from stabletts_tpu.ops.ode import odeint


@functools.partial(
    jax.jit,
    static_argnames=("model", "n_timesteps", "solver", "max_mel_len", "cfg"),
)
def synthesise(
    model: StableTTS,
    variables,
    x: jnp.ndarray,
    x_lengths: jnp.ndarray,
    noise: jnp.ndarray,
    y_ref: jnp.ndarray,
    n_timesteps: int = 10,
    temperature: float = 1.0,
    length_scale: float = 1.0,
    solver: str = "euler",
    cfg: float = 1.0,
    max_mel_len: int = 1000,
) -> dict:
    """Full synthesise (reference: models/model.py:48-112), jit end to end.

    x: [B, Tx] phoneme ids; noise: [B, max_mel_len, n_mels] standard normal;
    y_ref: [B, Tref, n_mels] reference mel. Returns dict with decoder_outputs
    [B, max_mel_len, n_mels] and y_lengths for trimming.
    """
    prep = model.apply(
        variables, x, x_lengths, y_ref, max_mel_len, length_scale,
        method=StableTTS.prepare_synthesis,
    )
    mu_y, c, y_mask = prep["mu_y"], prep["c"], prep["y_mask"]

    cfg_on = cfg != 1.0

    def f(t, xt):
        tb = jnp.broadcast_to(t, (xt.shape[0],))
        if cfg_on:
            return model.apply(
                variables, tb, xt, y_mask, mu_y, c, cfg, method=StableTTS.cfg_velocity
            )
        return model.apply(variables, tb, xt, y_mask, mu_y, c, method=StableTTS.velocity)

    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    mel = odeint(f, noise * temperature, t_span, method=solver)
    return {
        "encoder_outputs": prep["mu_y"],
        "decoder_outputs": mel,
        "attn": prep["attn"],
        "y_lengths": prep["y_lengths"],
        "y_mask": y_mask,
    }
