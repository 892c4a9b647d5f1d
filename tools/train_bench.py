"""Training-step benchmark on the current platform (TPU by default).

Times the full jitted train step (forward incl. on-device MAS + backward +
AdamW) at realistic shapes, plus the MAS kernel alone, and reports
audio-seconds/s/chip of training throughput.
"""

import argparse
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
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
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
