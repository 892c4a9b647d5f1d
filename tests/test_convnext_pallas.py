"""Fused Vocos ConvNeXt path (ops/convnext_pallas.py + vocos_apply_fused)
vs the standard flax apply, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.config import MelConfig, VocosConfig
from stabletts_tpu.models.vocos import Vocos, vocos_apply_fused


def _setup(t):
    mel_cfg = MelConfig(n_fft=256, win_length=256, hop_length=64, n_mels=20, pad=0)
    cfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=96, num_layers=3)
    m = Vocos(cfg, mel_cfg)
    mel = jax.random.normal(jax.random.PRNGKey(0), (2, t, 20))
    v = m.init(jax.random.PRNGKey(1), mel)
    return m, v, mel


def test_fused_vocos_matches_apply():
    m, v, mel = _setup(48)  # multiple of 8: no inter-block padding
    ref = m.apply(v, mel)
    got = vocos_apply_fused(m, v, mel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_vocos_nonaligned_length():
    m, v, mel = _setup(50)  # pad rows must stay zero between blocks
    ref = m.apply(v, mel)
    got = vocos_apply_fused(m, v, mel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)
