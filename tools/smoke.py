"""End-to-end smoke drive: phoneme ids -> StableTTS synthesise -> Vocos -> waveform.

Random-init weights (no checkpoint needed); small shapes; runs on CPU or TPU.
Usage: python tools/smoke.py [--platform cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="cpu to force CPU, default = env platform")
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from stabletts_tpu.config import MelConfig, ModelConfig, VocosConfig
    from stabletts_tpu.models.sampler import synthesise
    from stabletts_tpu.models.stabletts import StableTTS
    from stabletts_tpu.models.vocos import Vocos
    from stabletts_tpu.text import cleaned_text_to_sequence, intersperse, symbols

    print(f"devices: {jax.devices()}")
    mel_cfg = MelConfig()
    model_cfg = ModelConfig()

    # "hello" as IPA-ish symbols present in the table
    phones = list("hɛloʊ ˈwɝld".replace("ɝ", "ə"))
    ids = intersperse(cleaned_text_to_sequence(phones), 0)
    x = jnp.asarray([ids], dtype=jnp.int32)
    x_lengths = jnp.asarray([len(ids)], dtype=jnp.int32)
    print(f"text ids: {x.shape}")

    model = StableTTS(
        n_vocab=len(symbols),
        mel_channels=mel_cfg.n_mels,
        hidden_channels=model_cfg.hidden_channels,
        filter_channels=model_cfg.filter_channels,
        n_heads=model_cfg.n_heads,
        n_enc_layers=model_cfg.n_enc_layers,
        n_dec_layers=model_cfg.n_dec_layers,
        kernel_size=model_cfg.kernel_size,
        p_dropout=model_cfg.p_dropout,
        gin_channels=model_cfg.gin_channels,
    )

    rng = jax.random.PRNGKey(0)
    max_mel = 256
    y_ref = jax.random.normal(rng, (1, 80, mel_cfg.n_mels))
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, max_mel, mel_cfg.n_mels))

    t0 = time.time()
    from stabletts_tpu.models import init_stabletts_params

    variables = init_stabletts_params(model, rng)
    n_params = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
    print(f"init: {time.time()-t0:.1f}s, params: {n_params/1e6:.2f}M")

    t0 = time.time()
    out = synthesise(
        model, variables, x, x_lengths, noise, y_ref,
        n_timesteps=args.steps, cfg=3.0, max_mel_len=max_mel,
    )
    mel = out["decoder_outputs"]
    print(f"synthesise ({args.steps} euler steps, cfg=3): {time.time()-t0:.1f}s, "
          f"mel {mel.shape}, y_lengths {out['y_lengths']}")

    vocos = Vocos(VocosConfig(), mel_cfg)
    vvars = vocos.init(jax.random.PRNGKey(2), mel)
    nv = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(vvars["params"]))
    t0 = time.time()
    wav = vocos.apply(vvars, mel)
    print(f"vocos ({nv/1e6:.2f}M params): {time.time()-t0:.1f}s, wav {wav.shape}")
    print(f"wav stats: min {float(wav.min()):.4f} max {float(wav.max()):.4f}")
    assert wav.shape == (1, max_mel * mel_cfg.hop_length)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
