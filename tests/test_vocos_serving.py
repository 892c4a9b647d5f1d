"""Fixed-shape serving mode for the Vocos vocoder.

The length-masked forward (Vocos.__call__(mel, lengths) /
vocos_apply_fused(..., lengths=)) must produce the same waveform as vocoding
the trimmed input — the invariant that lets one compiled shape serve every
output length with no per-request recompile (VERDICT r1 #8).
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.config import MelConfig, VocosConfig


def _small_vocos():
    cfg = VocosConfig(input_channels=128, dim=64, intermediate_dim=128, num_layers=3)
    mel_cfg = MelConfig()
    from stabletts_tpu.models.vocos import Vocos

    model = Vocos(cfg, mel_cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 128)))
    return model, variables, mel_cfg


@pytest.mark.slow
def test_masked_vocos_matches_trimmed():
    model, variables, mel_cfg = _small_vocos()
    rng = np.random.default_rng(0)
    t_cap, hop = 64, mel_cfg.hop_length
    mel = jnp.asarray(rng.standard_normal((2, t_cap, 128)), jnp.float32)
    lengths = jnp.asarray([40, 64], jnp.int32)

    masked = model.apply(variables, mel, lengths)
    assert masked.shape == (2, t_cap * hop)
    for i, ln in enumerate([40, 64]):
        exact = model.apply(variables, mel[i : i + 1, :ln, :])
        got = np.asarray(masked[i, : ln * hop])
        np.testing.assert_allclose(got, np.asarray(exact[0]), rtol=2e-5, atol=2e-5)
        # the last valid frame's window reaches win - hop - pad samples past
        # ln*hop; beyond that the waveform is exactly zero
        tail = ln * hop + 2048
        assert np.all(np.asarray(masked[i, tail:]) == 0.0)


def test_masked_vocos_fused_path_interpret():
    """Same invariant through vocos_apply_fused (Pallas blocks in interpret
    mode on CPU) — the path TPU serving actually takes."""
    from stabletts_tpu.models.vocos import vocos_apply_fused

    model, variables, mel_cfg = _small_vocos()
    rng = np.random.default_rng(1)
    t_cap, hop = 40, mel_cfg.hop_length
    mel = jnp.asarray(rng.standard_normal((1, t_cap, 128)), jnp.float32)
    ln = 25

    masked = vocos_apply_fused(model, variables, mel,
                               lengths=jnp.asarray([ln], jnp.int32), interpret=True)
    exact = model.apply(variables, mel[:, :ln, :])
    np.testing.assert_allclose(
        np.asarray(masked[0, : ln * hop]), np.asarray(exact[0]), rtol=2e-4, atol=2e-4
    )


def test_api_warmup_covers_request_shapes(tmp_path):
    """After warmup over the shape grid, a request whose buckets lie on the
    grid issues no new jit shape key (VERDICT r1 #8: long-text request after
    warmup incurs no compile)."""
    from scipy.io import wavfile

    from stabletts_tpu.api import StableTTSAPI

    path = tmp_path / "ref.wav"
    sr = 44100
    t = np.linspace(0, 1.0, sr)
    wavfile.write(path, sr, (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16))

    api = StableTTSAPI()
    api.warmup(lengths=(64,), text_buckets=(64,), ref_buckets=(512,), step=2, cfg=1.0)
    n_keys = len(api._compiled_keys)
    wav, mel = api.inference(
        "Hello there.", str(path), "english", step=2, cfg=1.0, max_mel_len=64
    )
    assert np.isfinite(wav).all()
    assert len(api._compiled_keys) == n_keys  # request hit the warmed grid


def test_masked_vocos_one_compile_many_lengths():
    """One jitted shape serves every length: trace count stays at 1."""
    model, variables, mel_cfg = _small_vocos()
    traces = 0

    def apply_fn(v, m, lens):
        nonlocal traces
        traces += 1
        return model.apply(v, m, lens)

    jitted = jax.jit(apply_fn)
    mel = jnp.zeros((1, 32, 128), jnp.float32)
    for ln in (10, 20, 32):
        out = jitted(variables, mel, jnp.asarray([ln], jnp.int32))
        jax.block_until_ready(out)
    assert traces == 1
