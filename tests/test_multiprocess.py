"""Multi-process `jax.distributed` integration tests (CPU, Gloo collectives)
over three topologies of the same 8-device world: 2 hosts x 4 devices,
4 hosts x 2 devices, and 8 hosts x 1 device (max host fan-out).

Exercises every process_count>1 branch that single-process tests cannot:
per-rank `make_array_from_process_local_data` batch assembly
(parallel/mesh.py), cross-process gradient psum inside the jitted train step,
collective orbax checkpoint saves and resume (train/state.py), and the
rank-strided bucket sampler — the replacement for the reference's DDP
rendezvous + NCCL all-reduce (reference: train.py:25-28, 51).

The ground truth is a single-process run over the SAME logical global batch:
all ranks' sampler shards concatenated in device order. Since the z-slice
PRNG is derived per (seed, epoch, item) in collate, every world builds
identical global batches for its own sharding; the only numerical difference
left is collective reduction order, so params match to f32 reduction
tolerance.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _write_dataset(tmp_path, n_items=16, n_mels=16):
    rng = np.random.default_rng(0)
    filelist = tmp_path / "filelist.jsonl"
    with open(filelist, "w") as f:
        for i in range(n_items):
            T = int(rng.integers(40, 60))
            mel = rng.standard_normal((T, n_mels)).astype(np.float32)
            mel_path = tmp_path / f"mel_{i}.npy"
            np.save(mel_path, mel)
            f.write(json.dumps({
                "mel_path": str(mel_path), "phone": ["a", "b", "d", "e"],
                "mel_length": T,
            }) + "\n")
    return filelist


def _single_process_ground_truth(filelist, num_replicas=2, batch_size=4,
                                 num_epochs=2, seed=0):
    """Replays the N-process training on this process's 8 devices: global
    batch = concat of every rank's shard, same step/rng schedule."""
    from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
    from stabletts_tpu.data.dataset import StableDataset, collate
    from stabletts_tpu.data.sampler import DistributedBucketSampler
    from stabletts_tpu.models import build_stabletts, init_stabletts_params
    from stabletts_tpu.parallel import mesh as mesh_lib
    from stabletts_tpu.train.state import TrainState
    from stabletts_tpu.train.train_tts import make_optimizer, make_train_step

    tiny_model = ModelConfig(
        hidden_channels=32, filter_channels=64, n_heads=2,
        n_enc_layers=1, n_dec_layers=2, kernel_size=3, p_dropout=0.1,
        gin_channels=32,
    )
    tiny_mel = MelConfig(n_mels=16)
    cfg = TrainConfig(
        train_dataset_path=str(filelist), batch_size=batch_size,
        num_epochs=num_epochs, warmup_steps=1,
        bucket_boundaries=(32, 64, 128), max_text_len=16, seed=seed,
    )
    dataset = StableDataset(str(filelist))
    samplers = [
        DistributedBucketSampler(
            dataset.lengths, cfg.batch_size, list(cfg.bucket_boundaries),
            num_replicas=num_replicas, rank=r,
        )
        for r in range(num_replicas)
    ]
    steps_per_epoch = len(samplers[0])
    mesh = mesh_lib.make_mesh()
    model = build_stabletts(tiny_model, tiny_mel)
    variables = init_stabletts_params(model, jax.random.PRNGKey(cfg.seed))
    tx = make_optimizer(cfg, cfg.num_epochs * steps_per_epoch)
    state = TrainState(0, variables["params"], tx.init(variables["params"]))
    state = mesh_lib.replicate(mesh, state)
    step_fn = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    base_rng = jax.random.PRNGKey(cfg.seed + 1)

    for epoch in range(cfg.num_epochs):
        for s in samplers:
            s.set_epoch(epoch)
        for works in zip(*samplers):
            locals_ = []
            for s, (bucket, indices) in zip(samplers, works):
                locals_.append(collate(
                    dataset, indices, s.bucket_mel_len(bucket),
                    cfg.max_text_len, tiny_mel.n_mels, (cfg.seed, epoch),
                ).as_tuple())
            global_batch = tuple(
                np.concatenate(parts, axis=0) for parts in zip(*locals_)
            )
            device_batch = mesh_lib.shard_batch(mesh, global_batch)
            state, metrics = step_fn(state, device_batch, base_rng)
    return jax.device_get(state.params)


@pytest.mark.skipif(jax.device_count() != 8, reason="needs the 8-device CPU mesh")
@pytest.mark.parametrize(
    "num_procs,local_devices,batch_size",
    [
        pytest.param(2, 4, 4, id="2hosts_x_4dev"),
        pytest.param(4, 2, 2, id="4hosts_x_2dev"),
        # max host fan-out: every device behind its own process/DCN boundary
        # — the closest CPU-envelope stand-in for multi-host scaling
        pytest.param(8, 1, 1, id="8hosts_x_1dev"),
    ],
)
@pytest.mark.slow
def test_multi_process_training_matches_single_process(
    tmp_path, num_procs, local_devices, batch_size
):
    filelist = _write_dataset(tmp_path)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    port = _free_port()

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device-count flag
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             "--rank", str(r), "--port", str(port),
             "--data-dir", str(tmp_path), "--out-dir", str(out_dir),
             "--num-procs", str(num_procs),
             "--local-devices", str(local_devices),
             "--batch-size", str(batch_size)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for r in range(num_procs)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"{num_procs}-process training timed out")
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"rank {r}: OK" in out

    # every rank observed identical (replicated) final params
    got = [np.load(out_dir / f"params_rank{r}.npz") for r in range(num_procs)]
    for r in range(1, num_procs):
        assert set(got[0].files) == set(got[r].files)
        for k in got[0].files:
            np.testing.assert_array_equal(got[0][k], got[r][k])

    # collective orbax save produced the per-epoch directories
    assert (out_dir / "ckpt" / "checkpoint_1").is_dir()
    assert (out_dir / "ckpt" / "optimizer_1").is_dir()

    # the distributed run matches a single-process run of the same logical
    # batches (tolerance = f32 collective reduction-order noise)
    truth = _single_process_ground_truth(
        filelist, num_replicas=num_procs, batch_size=batch_size
    )
    flat_truth = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(truth)[0]
    }
    assert set(flat_truth) == set(got[0].files)
    for k in sorted(flat_truth):
        np.testing.assert_allclose(
            got[0][k], flat_truth[k], rtol=2e-5, atol=2e-6, err_msg=k
        )
