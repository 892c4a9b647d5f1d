"""Vocoder round-trip example (reference: vocoders/vocos/inference.ipynb):
wav -> log-mel -> Vocos -> wav, reporting the reconstruction error.

    python examples/vocos_inference.py --audio some.wav [--ckpt generator_9]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", required=True)
    ap.add_argument("--ckpt", default=None, help="vocos checkpoint (orbax dir or torch .pt)")
    ap.add_argument("--out", default="reconstructed.wav")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from stabletts_tpu.api import get_vocoder
    from stabletts_tpu.config import MelConfig, VocosConfig
    from stabletts_tpu.models.vocos import Vocos
    from stabletts_tpu.ops.stft import log_mel_spectrogram
    from stabletts_tpu.utils.audio_io import load_and_resample_audio, save_wav

    mel_cfg = MelConfig()
    wav = load_and_resample_audio(args.audio, mel_cfg.sample_rate)
    if wav is None:
        raise SystemExit(f"could not load {args.audio}")
    mel = log_mel_spectrogram(jnp.asarray(wav)[None, :], mel_cfg)
    print(f"input {wav.shape[0] / mel_cfg.sample_rate:.2f}s -> mel {mel.shape}")

    if args.ckpt:
        model, variables = get_vocoder(args.ckpt, "vocos")
    else:
        model = Vocos(VocosConfig(), mel_cfg)
        variables = model.init(jax.random.PRNGKey(0), mel[:, :8])
        print("(random weights — output will be noise)")

    recon = np.asarray(model.apply(variables, mel))[0]
    save_wav(args.out, recon, mel_cfg.sample_rate)
    n = min(len(recon), len(wav))
    l1 = float(np.mean(np.abs(recon[:n] - wav[:n])))
    print(f"wrote {args.out}; waveform L1 vs input: {l1:.4f}")


if __name__ == "__main__":
    main()
