"""End-to-end inference example (reference: inference.ipynb).

Loads a StableTTS checkpoint (converted reference .pt or native orbax dir)
plus a vocoder, and synthesizes speech in the voice of a reference clip.

    python examples/inference.py --tts-ckpt checkpoints/checkpoint_0.pt \
        --vocoder-ckpt vocoders/vocos.pt --vocoder vocos \
        --ref ref.wav --out output.wav

Without checkpoints it runs with random weights (pipeline smoke test).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tts-ckpt", default=None)
    ap.add_argument("--vocoder-ckpt", default=None)
    ap.add_argument("--vocoder", default="vocos", choices=["vocos", "ffgan"])
    ap.add_argument("--ref", required=True, help="reference audio (voice to clone)")
    ap.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    ap.add_argument("--language", default="english")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--solver", default="dopri5", help="euler|midpoint|heun2|heun3|rk4|dopri5")
    ap.add_argument("--cfg", type=float, default=3.0)
    ap.add_argument("--out", default="output.wav")
    args = ap.parse_args()

    from stabletts_tpu.api import StableTTSAPI
    from stabletts_tpu.utils.audio_io import save_wav

    api = StableTTSAPI(args.tts_ckpt, args.vocoder_ckpt, args.vocoder)
    tts_m, voc_m = api.get_params()
    print(f"tts: {tts_m:.2f}M params, vocoder ({args.vocoder}): {voc_m:.2f}M params")

    wav, mel = api.inference(
        args.text, args.ref, args.language,
        step=args.steps, solver=args.solver, cfg=args.cfg,
    )
    print(f"mel: {mel.shape}  wav: {wav.shape}")
    save_wav(args.out, wav[0], api.mel_config.sample_rate)
    print(f"wrote {args.out} ({wav.shape[1] / api.mel_config.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
