"""Training-step benchmark on the current platform (TPU by default).

Times the full jitted train step (forward incl. on-device MAS + backward +
AdamW) at realistic shapes, plus the MAS kernel alone, and reports
audio-seconds/s/chip of training throughput.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mel-frames", type=int, default=1000)
    ap.add_argument("--text-len", type=int, default=384)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize estimator blocks (ModelConfig.remat)")
    ap.add_argument("--from-disk", action="store_true",
                    help="feed real .npy mels from disk through the sampler + "
                         "prefetch pipeline instead of a resident device batch")
    ap.add_argument("--loader-workers", type=int, default=4)
    ap.add_argument("--prefetch-depth", type=int, default=8)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of 2 steady-state steps")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        cache_dir = os.path.expanduser("~/.cache/stabletts_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    import dataclasses

    from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
    from stabletts_tpu.models import build_stabletts, init_stabletts_params
    from stabletts_tpu.train.state import TrainState
    from stabletts_tpu.train.train_tts import make_optimizer, make_train_step

    b, ty, tx = args.batch, args.mel_frames, args.text_len
    mel_cfg = MelConfig()
    model = build_stabletts(dataclasses.replace(ModelConfig(), remat=args.remat))
    variables = init_stabletts_params(model, jax.random.PRNGKey(0))
    tx_opt = make_optimizer(TrainConfig(), total_steps=10000)
    state = TrainState(0, variables["params"], tx_opt.init(variables["params"]))
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None
    step_fn = jax.jit(make_train_step(model, tx_opt, compute_dtype), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = (
        jnp.asarray(rng.integers(1, 400, (b, tx)), jnp.int32),
        jnp.full((b,), tx, jnp.int32),
        jnp.asarray(rng.standard_normal((b, ty, mel_cfg.n_mels)), jnp.float32),
        jnp.full((b,), ty, jnp.int32),
        jnp.asarray(rng.standard_normal((b, 256, mel_cfg.n_mels)), jnp.float32),
        jnp.full((b,), 256, jnp.int32),
    )
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    state, metrics = step_fn(state, batch, key)
    loss0 = float(metrics["loss"])
    compile_s = time.time() - t0
    print(f"compile: {compile_s:.1f}s, first loss {loss0:.3f}")

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(2):
                state, metrics = step_fn(state, batch, key)
            float(metrics["loss"])

    t0 = time.time()
    for _ in range(args.iters):
        state, metrics = step_fn(state, batch, key)
    loss = float(metrics["loss"])  # sync
    wall = (time.time() - t0) / args.iters
    audio_s = b * ty * mel_cfg.hop_length / mel_cfg.sample_rate
    print(
        f"train step: {wall*1000:.1f} ms at B={b} Ty={ty} Tx={tx} "
        f"-> {audio_s/wall:.1f} audio-s/s/chip (loss {loss:.3f})"
    )
    print(json.dumps({
        "metric": "tts_train_audio_s_per_s_per_chip",
        "value": round(audio_s / wall, 2),
        "unit": "audio-s/s/chip",
        "detail": {"ms_per_step": round(wall * 1e3, 1), "batch": b, "ty": ty,
                   "tx": tx, "dtype": args.dtype, "remat": args.remat,
                   "platform": jax.devices()[0].platform},
    }))

    if args.from_disk:
        # Real-data path: .npy mels on disk -> bucket sampler -> threaded
        # collate + H2D prefetch -> train step. Measures whether the input
        # pipeline keeps the chip busy (VERDICT r1 #4: synchronous loading
        # sat on the critical path; target <5% regression vs synthetic).
        import tempfile

        from stabletts_tpu.data.dataset import StableDataset, collate
        from stabletts_tpu.data.prefetch import prefetch
        from stabletts_tpu.data.sampler import DistributedBucketSampler

        rng_d = np.random.default_rng(7)
        n_items = max(4 * b, 64)
        with tempfile.TemporaryDirectory(prefix="stabletts_bench_") as tmp:
            fl_path = os.path.join(tmp, "filelist.jsonl")
            with open(fl_path, "w", encoding="utf-8") as fh:
                for i in range(n_items):
                    t_i = int(rng_d.integers(int(ty * 0.9), ty + 1))
                    mel = rng_d.standard_normal((t_i, mel_cfg.n_mels)).astype(np.float32)
                    mel_path = os.path.join(tmp, f"{i}.npy")
                    np.save(mel_path, mel)
                    phones = ["a1", "i1", "u1", "e1", "o1"] * (tx // 12)
                    fh.write(json.dumps({
                        "mel_path": mel_path, "phone": phones, "mel_length": t_i,
                    }) + "\n")

            dataset = StableDataset(fl_path)
            sampler = DistributedBucketSampler(
                dataset.lengths, b, [32, ty], num_replicas=1, rank=0)
            sampler.set_epoch(0)

            def make_batch(work):
                batch_idx, (bucket, indices) = work
                r = np.random.default_rng(np.random.SeedSequence([0, batch_idx]))
                hb = collate(dataset, indices, sampler.bucket_mel_len(bucket),
                             tx, mel_cfg.n_mels, r)
                return jax.device_put(hb.as_tuple())

            # step_fn donates its state arg, so thread one live state through
            # both timed runs via this holder
            live = {"state": state}

            def run_epochs(n_steps, workers, depth):
                done = 0
                state2 = live["state"]
                t_start = None
                while done < n_steps + 1:
                    work = enumerate(sampler)
                    stream = (prefetch(work, make_batch, workers, depth)
                              if workers > 0 else map(make_batch, work))
                    for db in stream:
                        state2, m = step_fn(state2, db, key)
                        done += 1
                        if done == 1:  # skip compile/warmup step
                            jax.block_until_ready(m["loss"])
                            t_start = time.time()
                        if done >= n_steps + 1:
                            break
                jax.block_until_ready(m["loss"])
                live["state"] = state2
                return (time.time() - t_start) / n_steps

            n_steps = max(args.iters, 4)
            wall_sync = run_epochs(n_steps, 0, 0)
            wall_pre = run_epochs(n_steps, args.loader_workers, args.prefetch_depth)
            print(
                f"from-disk step: sync {wall_sync*1000:.1f} ms | prefetch "
                f"{wall_pre*1000:.1f} ms (workers={args.loader_workers}) | "
                f"synthetic {wall*1000:.1f} ms -> overhead "
                f"{(wall_pre/wall-1)*100:+.1f}% vs synthetic"
            )

    # MAS alone at the same shape (the dispatch the train step actually uses),
    # amortized: queue all iterations, sync once (a per-call sync would
    # measure the host<->device round-trip, not the kernel)
    from stabletts_tpu.ops.mas import maximum_path_auto

    mas_fn = jax.jit(maximum_path_auto)
    neg_cent = jnp.asarray(rng.standard_normal((b, ty, tx)), jnp.float32)
    mask = jnp.ones((b, ty, tx))
    _ = float(mas_fn(neg_cent, mask).sum())
    n = max(args.iters * 4, 20)
    t0 = time.time()
    outs = [mas_fn(neg_cent, mask) for _ in range(n)]
    _ = float(outs[-1].sum())
    print(f"MAS [B={b},{ty},{tx}]: {(time.time()-t0)/n*1000:.2f} ms")


if __name__ == "__main__":
    main()
