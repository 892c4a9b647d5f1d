"""Training tests: jitted train step on an 8-device CPU mesh (DP sharding),
loss decrease on a tiny synthetic dataset, checkpoint resume semantics."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
from stabletts_tpu.models import build_stabletts, init_stabletts_params
from stabletts_tpu.parallel import mesh as mesh_lib
from stabletts_tpu.train.train_tts import make_optimizer, make_train_step

TINY_MODEL = ModelConfig(
    hidden_channels=32, filter_channels=64, n_heads=2,
    n_enc_layers=1, n_dec_layers=2, kernel_size=3, p_dropout=0.1, gin_channels=32,
)
TINY_MEL = MelConfig(n_mels=16)


def _tiny_batch(b=8, tx=12, ty=32, n_mels=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(1, 50, size=(b, tx)).astype(np.int32)
    xl = np.full((b,), tx, dtype=np.int32)
    xl[1] = tx - 4
    y = rng.standard_normal((b, ty, n_mels)).astype(np.float32)
    yl = np.full((b,), ty, dtype=np.int32)
    yl[1] = ty - 8
    z = rng.standard_normal((b, 10, n_mels)).astype(np.float32)
    zl = np.full((b,), 10, dtype=np.int32)
    return (x, xl, y, yl, z, zl)


@pytest.fixture(scope="module")
def setup():
    model = build_stabletts(TINY_MODEL, TINY_MEL)
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=2)
    tx = make_optimizer(cfg, total_steps=100)
    from stabletts_tpu.train.state import TrainState

    state = TrainState(step=0, params=variables["params"], opt_state=tx.init(variables["params"]))
    step_fn = jax.jit(make_train_step(model, tx))
    return model, state, step_fn


def test_train_step_runs_and_loss_decreases(setup):
    model, state, step_fn = setup
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch())
    rng = jax.random.PRNGKey(42)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # overfit a fixed batch: loss must drop substantially
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_train_step_sharded_8_devices(setup):
    model, state, step_fn = setup
    assert jax.device_count() == 8
    mesh = mesh_lib.make_mesh()
    batch = mesh_lib.shard_batch(mesh, _tiny_batch(b=16))
    state = mesh_lib.replicate(mesh, state)
    rng = jax.random.PRNGKey(1)
    state2, metrics = step_fn(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # params remain fully replicated after the update (gradient was all-reduced)
    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_matches_single_device(setup):
    """DP-sharded step computes the same loss/update as unsharded."""
    model, state, step_fn = setup
    batch_np = _tiny_batch(b=16, seed=3)
    rng = jax.random.PRNGKey(7)

    s1, m1 = step_fn(state, jax.tree_util.tree_map(jnp.asarray, batch_np), rng)

    mesh = mesh_lib.make_mesh()
    sharded = mesh_lib.shard_batch(mesh, batch_np)
    s2, m2 = step_fn(mesh_lib.replicate(mesh, state), sharded, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)[5]
    l2 = jax.tree_util.tree_leaves(s2.params)[5]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6)


def test_end_to_end_training_loop(tmp_path):
    """Tiny synthetic dataset through the full train() entry point."""
    from stabletts_tpu.train.train_tts import train

    n_mels = TINY_MEL.n_mels
    rng = np.random.default_rng(0)
    filelist = tmp_path / "filelist.jsonl"
    with open(filelist, "w") as f:
        for i in range(8):
            T = int(rng.integers(40, 60))
            mel = rng.standard_normal((T, n_mels)).astype(np.float32)
            mel_path = tmp_path / f"mel_{i}.npy"
            np.save(mel_path, mel)
            f.write(json.dumps({
                "mel_path": str(mel_path),
                "phone": ["a", "b", "d", "e"],
                "mel_length": T,
            }) + "\n")

    logged = []
    cfg = TrainConfig(
        train_dataset_path=str(filelist),
        batch_size=8,
        num_epochs=2,
        model_save_path=str(tmp_path / "ckpt"),
        warmup_steps=1,
        bucket_boundaries=(32, 64, 128),
        max_text_len=16,
        log_interval=1,
    )
    state = train(cfg, TINY_MODEL, TINY_MEL, log_fn=lambda step, m: logged.append(m))
    assert int(state.step) == 2 * 1  # 2 epochs x 1 step (8 items / batch 8)
    assert logged and np.isfinite(logged[-1]["loss"])
    # checkpoints written per epoch
    assert os.path.isdir(tmp_path / "ckpt" / "checkpoint_1")
    assert os.path.isdir(tmp_path / "ckpt" / "optimizer_1")


def test_checkpoint_resume(tmp_path):
    from stabletts_tpu.train.state import TrainState, continue_training, save_checkpoint

    model = build_stabletts(TINY_MODEL, TINY_MEL)
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))
    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=2)
    tx = make_optimizer(cfg, 100)
    params = variables["params"]
    opt_state = tx.init(params)

    # fresh dir: nothing to resume
    e, p, o = continue_training(str(tmp_path / "none"), params, opt_state)
    assert e == 0

    # save epoch 3 and resume
    mutated = jax.tree_util.tree_map(lambda a: a + 1.0, params)
    save_checkpoint(str(tmp_path / "ck"), 3, mutated, opt_state)
    e, p, o = continue_training(str(tmp_path / "ck"), params, opt_state)
    assert e == 4
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(p)[0]),
        np.asarray(jax.tree_util.tree_leaves(mutated)[0]),
    )

    # model-only checkpoint = pretrained finetune init at epoch 0
    import shutil

    shutil.rmtree(tmp_path / "ck" / "optimizer_3")
    e, p, o = continue_training(str(tmp_path / "ck"), params, opt_state)
    assert e == 0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(p)[0]),
        np.asarray(jax.tree_util.tree_leaves(mutated)[0]),
    )


@pytest.mark.slow
def test_remat_matches_no_remat_exactly():
    # ModelConfig.remat wraps each DiT block in jax.checkpoint: identical
    # math and param tree (checkpoint-compatible), less activation memory
    import dataclasses

    from stabletts_tpu.train.state import TrainState

    cfg = TrainConfig(learning_rate=1e-3, warmup_steps=2)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch())
    rng = jax.random.PRNGKey(7)
    results = []
    for remat in (False, True):
        model = build_stabletts(dataclasses.replace(TINY_MODEL, remat=remat), TINY_MEL)
        variables = init_stabletts_params(model, jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, total_steps=100)
        state = TrainState(0, variables["params"], tx.init(variables["params"]))
        step_fn = jax.jit(make_train_step(model, tx))
        state, metrics = step_fn(state, batch, rng)
        state, metrics = step_fn(state, batch, rng)
        results.append((variables["params"], float(metrics["loss"]), state.params))

    (p0, l0, s0), (p1, l1, s1) = results
    # identical param tree structure and init values
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_transfer_dtype_float16_close_to_f32(tmp_path):
    """TrainConfig.transfer_dtype='float16' ships mels at half width and
    widens at step entry; one step's losses must track the f32-shipped
    step within f16 quantization error."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stabletts_tpu.config import MelConfig, TrainConfig
    from stabletts_tpu.models import build_stabletts, init_stabletts_params
    from stabletts_tpu.train.state import TrainState
    from stabletts_tpu.train.train_tts import make_optimizer, make_train_step

    mel_cfg = MelConfig()
    model = build_stabletts(_tiny_cfg()) if "_tiny_cfg" in globals() else build_stabletts()
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))
    tx_opt = make_optimizer(TrainConfig(), total_steps=100)
    step = jax.jit(make_train_step(model, tx_opt, None))
    rng = np.random.default_rng(0)
    b, ty, tx, tz = 2, 64, 24, 24
    batch32 = (
        jnp.asarray(rng.integers(1, 400, (b, tx)), jnp.int32),
        jnp.full((b,), tx, jnp.int32),
        jnp.asarray(rng.standard_normal((b, ty, mel_cfg.n_mels)), jnp.float32),
        jnp.full((b,), ty, jnp.int32),
        jnp.asarray(rng.standard_normal((b, tz, mel_cfg.n_mels)), jnp.float32),
        jnp.full((b,), tz, jnp.int32),
    )
    batch16 = tuple(
        a.astype(jnp.float16) if a.dtype == jnp.float32 else a for a in batch32
    )
    key = jax.random.PRNGKey(5)
    state = TrainState(0, variables["params"], tx_opt.init(variables["params"]))
    _, m32 = step(state, batch32, key)
    state = TrainState(0, variables["params"], tx_opt.init(variables["params"]))
    _, m16 = step(state, batch16, key)
    assert np.isfinite(float(m16["loss"]))
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.02 * abs(float(m32["loss"]))
