"""Worker for the multi-process `jax.distributed` integration tests
(tests/test_multiprocess.py). Each process owns --local-devices virtual CPU
devices; together the --num-procs processes form one SPMD world (the CPU
stand-in for an N-host TPU pod slice, replacing the reference's DDP
rendezvous at train.py:25-28). Tested topologies: 2 hosts x 4 devices and
4 hosts x 2 devices, both an 8-device world.

Runs the REAL train() entry point — rank-strided sampler shard,
make_array_from_process_local_data batch assembly, cross-process psum in the
jitted step, collective orbax checkpoint saves — then verifies checkpoint
resume restores the final state bit-exactly, and dumps the final params for
the parent to compare against a single-process ground-truth run.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--num-procs", type=int, default=2)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=4)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        )

    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: every worker compiles the same tiny-model
    # step; cache hits cut the 3-topology suite time substantially on reruns
    try:
        cache_dir = os.path.expanduser("~/.cache/stabletts_jax_cache_cpu")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    jax.distributed.initialize(
        f"localhost:{args.port}", num_processes=args.num_procs, process_id=args.rank
    )
    # scaling bookkeeping: every host sees the same global world, owns
    # exactly its local slice, and contributes batch_size items per step
    assert jax.process_count() == args.num_procs
    assert jax.device_count() == args.num_procs * args.local_devices
    assert jax.local_device_count() == args.local_devices

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import numpy as np

    from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
    from stabletts_tpu.train.train_tts import train
    from stabletts_tpu.train.state import continue_training

    tiny_model = ModelConfig(
        hidden_channels=32, filter_channels=64, n_heads=2,
        n_enc_layers=1, n_dec_layers=2, kernel_size=3, p_dropout=0.1,
        gin_channels=32,
    )
    tiny_mel = MelConfig(n_mels=16)
    cfg = TrainConfig(
        train_dataset_path=os.path.join(args.data_dir, "filelist.jsonl"),
        batch_size=args.batch_size,  # per process; global = num_procs * this
        num_epochs=2,
        model_save_path=os.path.join(args.out_dir, "ckpt"),
        warmup_steps=1,
        bucket_boundaries=(32, 64, 128),
        max_text_len=16,
    )

    # per-host shard bookkeeping: one assembled global batch must have
    # global shape num_procs*batch_size with this host holding exactly
    # batch_size rows across its local shards
    from stabletts_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    probe = np.zeros((cfg.batch_size, 8), np.float32)
    garr = mesh_lib.shard_batch(mesh, (probe,))[0]
    assert garr.shape == (args.num_procs * cfg.batch_size, 8), garr.shape
    local_rows = sum(s.data.shape[0] for s in garr.addressable_shards)
    assert local_rows == cfg.batch_size, local_rows

    state = train(cfg, tiny_model, tiny_mel)
    final_params = jax.device_get(state.params)

    # resume path: the collective orbax save must restore the final epoch
    # bit-exactly on every rank
    start_epoch, restored, _ = continue_training(
        cfg.model_save_path, final_params, jax.device_get(state.opt_state)
    )
    assert start_epoch == cfg.num_epochs, start_epoch
    for a, b in zip(
        jax.tree_util.tree_leaves(final_params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    flat = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(final_params)[0]
    }
    np.savez(os.path.join(args.out_dir, f"params_rank{args.rank}.npz"), **flat)
    with open(os.path.join(args.out_dir, f"done_rank{args.rank}.json"), "w") as f:
        json.dump({"step": int(state.step)}, f)
    print(f"rank {args.rank}: OK", flush=True)


if __name__ == "__main__":
    main()
