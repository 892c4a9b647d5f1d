"""Vocos GAN training-step benchmark at the reference's training shapes:
training config dim=768/inter=2048/12 layers (vocoders/vocos/config.py:21-26),
segment_size=20480 samples, MPD(2,3,5,7,11) + MRD(2048,1024,512) both stepped
before the generator. Reports audio-seconds/s/chip of vocoder training."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler trace of the timed iterations")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # persistent compile cache (same as bench.py): the tunneled remote
    # compile of the full GAN step takes minutes; cache hits skip it
    try:
        cache_dir = os.path.expanduser("~/.cache/stabletts_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from stabletts_tpu.config import MelConfig, VocosConfig, VocosTrainConfig
    from stabletts_tpu.train.train_vocos import init_vocos_training

    mel_cfg = MelConfig()
    vocos_cfg = VocosConfig(dim=768, intermediate_dim=2048, num_layers=12)
    train_cfg = VocosTrainConfig(batch_size=args.batch, compute_dtype=args.dtype)
    gen, mpd, mrd, state, step_fn = init_vocos_training(vocos_cfg, mel_cfg, train_cfg, 10000)

    b, seg = args.batch, train_cfg.segment_size
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, seg)) * 0.1, jnp.float32
    )

    t0 = time.time()
    state, metrics = step_fn(state, audio)
    print(f"compile: {time.time()-t0:.1f}s, gen_loss_total {float(metrics['gen_loss_total']):.3f}")
    state, metrics = step_fn(state, audio)

    if args.profile:
        with jax.profiler.trace(args.profile):
            for _ in range(2):
                state, metrics = step_fn(state, audio)
            float(metrics["gen_loss_total"])

    t0 = time.time()
    for _ in range(args.iters):
        state, metrics = step_fn(state, audio)
    float(metrics["gen_loss_total"])
    wall = (time.time() - t0) / args.iters
    audio_seconds = b * seg / mel_cfg.sample_rate
    print(
        f"vocos GAN step: {wall*1e3:.1f} ms at B={b} seg={seg} "
        f"-> {audio_seconds/wall:.1f} audio-s/s/chip"
    )
    print(json.dumps({
        "metric": "vocos_gan_train_audio_s_per_s_per_chip",
        "value": round(audio_seconds / wall, 2),
        "unit": "audio-s/s/chip",
        "detail": {"ms_per_step": round(wall * 1e3, 1), "batch": b,
                   "segment": seg, "dtype": args.dtype,
                   "platform": jax.devices()[0].platform},
    }))


if __name__ == "__main__":
    main()
