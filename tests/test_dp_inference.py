"""Data-parallel inference over the device mesh: the jitted synthesise is a
pure function, so sharding the batch over 'data' scales it across chips with
no code changes; outputs must match the unsharded run exactly."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from stabletts_tpu.config import MelConfig, ModelConfig
from stabletts_tpu.models import build_stabletts, init_stabletts_params
from stabletts_tpu.models.sampler import synthesise
from stabletts_tpu.parallel import mesh as mesh_lib

TINY = ModelConfig(
    hidden_channels=32, filter_channels=64, n_heads=2,
    n_enc_layers=1, n_dec_layers=2, kernel_size=3, p_dropout=0.1, gin_channels=32,
)


@pytest.mark.slow
def test_sharded_inference_matches_single_device():
    assert jax.device_count() == 8
    mel_cfg = MelConfig(n_mels=16)
    model = build_stabletts(TINY, mel_cfg)
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))

    b = 16
    rng = np.random.default_rng(0)
    x = rng.integers(1, 50, size=(b, 10)).astype(np.int32)
    xl = np.full((b,), 10, dtype=np.int32)
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (b, 64, 16)))
    y_ref = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (b, 24, 16)))

    out1 = synthesise(
        model, variables, jnp.asarray(x), jnp.asarray(xl), jnp.asarray(noise),
        jnp.asarray(y_ref), n_timesteps=2, cfg=2.0, max_mel_len=64,
    )

    mesh = mesh_lib.make_mesh()
    sx, sxl, snoise, sref = mesh_lib.shard_batch(mesh, (x, xl, noise, y_ref))
    svars = mesh_lib.replicate(mesh, variables)
    out2 = synthesise(
        model, svars, sx, sxl, snoise, sref, n_timesteps=2, cfg=2.0, max_mel_len=64,
    )

    np.testing.assert_array_equal(
        np.asarray(out1["y_lengths"]), np.asarray(out2["y_lengths"])
    )
    np.testing.assert_allclose(
        np.asarray(out1["decoder_outputs"]), np.asarray(out2["decoder_outputs"]),
        rtol=1e-5, atol=1e-5,
    )
    # output actually sharded over the mesh
    assert not out2["decoder_outputs"].sharding.is_fully_replicated


def test_generate_path_positions_are_f32_exact():
    # bf16 has ulp 4 above 512: an arange/cumsum in bf16 collapses consecutive
    # frame positions, so short phonemes past frame 512 get zero frames. The
    # synthesis path (prepare_synthesis) must therefore run this geometry in
    # f32 regardless of compute_dtype.
    from stabletts_tpu.models.stabletts import generate_path

    n_ph, per, t_mel = 300, 2.0, 600
    dur = jnp.full((1, n_ph), per, jnp.float32)
    mask = jnp.ones((1, n_ph, t_mel), jnp.float32)
    frames = np.asarray(generate_path(dur, mask).sum(axis=2))
    assert (frames == per).all()  # every phoneme keeps exactly its 2 frames

    # the failure mode this guards against: the same geometry in bf16 drops
    # phonemes past frame 512 (documenting WHY the f32 rule exists)
    f16 = np.asarray(
        generate_path(dur.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)).sum(axis=2)
    )
    assert (f16 == 0).any()


def test_bf16_compute_drops_no_interior_phoneme():
    # end-to-end: under compute_dtype=bfloat16 with many short phonemes the
    # alignment must still give every phoneme inside the clipped length >= 1
    # frame (the pre-fix bf16 path zeroed phonemes past ~frame 512)
    mel_cfg = MelConfig(n_mels=16)
    model = build_stabletts(TINY, mel_cfg)
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))

    b, tx, t_mel = 2, 400, 768
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(1, 50, size=(b, tx)), jnp.int32)
    xl = jnp.full((b,), tx, dtype=jnp.int32)
    noise = jax.random.normal(jax.random.PRNGKey(1), (b, t_mel, 16))
    y_ref = jax.random.normal(jax.random.PRNGKey(2), (b, 24, 16))

    out = synthesise(
        model, variables, x, xl, noise, y_ref,
        n_timesteps=1, max_mel_len=t_mel, length_scale=2.0,
        compute_dtype=jnp.bfloat16,
    )
    y_len = np.asarray(out["y_lengths"])
    assert (y_len > 512).all()  # the scenario is live
    frames = np.asarray(out["attn"]).sum(axis=2)  # [B, Tx]
    ends = frames.cumsum(axis=1)
    for i in range(b):
        interior = ends[i] < y_len[i]  # phonemes fully inside the clip
        assert (frames[i][interior] > 0).all(), "interior phoneme lost its frames"
