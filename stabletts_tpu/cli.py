"""Command-line interface (improvement over the reference's edit-the-source
config workflow; entry points mirror train.py / preprocess.py / api.py).

Usage:
  python -m stabletts_tpu.cli preprocess --input filelist.txt --language english
  python -m stabletts_tpu.cli train --dataset filelists/filelist.json
  python -m stabletts_tpu.cli train-vocos --dataset audio_dir/
  python -m stabletts_tpu.cli synth --text "hello" --ref ref.wav --language english \
      --tts-ckpt ckpt/checkpoint_9 --vocoder-ckpt vocos.pt --vocoder vocos --out out.wav
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def cmd_preprocess(args):
    from stabletts_tpu.data.preprocess import DataConfig, preprocess

    cfg = DataConfig(
        input_filelist_path=args.input,
        output_filelist_path=args.output,
        mel_output_dir=args.mel_dir,
        language=args.language,
    )
    n = preprocess(cfg)
    print(f"preprocessed {n} utterances -> {args.output}")


def cmd_train(args):
    from stabletts_tpu.config import ModelConfig, TrainConfig
    from stabletts_tpu.train.train_tts import train

    cfg = TrainConfig()
    cfg = dataclasses.replace(
        cfg,
        train_dataset_path=args.dataset or cfg.train_dataset_path,
        batch_size=args.batch_size or cfg.batch_size,
        num_epochs=args.epochs or cfg.num_epochs,
        model_save_path=args.save_path or cfg.model_save_path,
        learning_rate=args.lr or cfg.learning_rate,
        compute_dtype=args.compute_dtype or cfg.compute_dtype,
    )
    model_cfg = dataclasses.replace(ModelConfig(), remat=args.remat)

    def log_fn(step, metrics):
        print(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}))

    train(cfg, model_cfg, log_fn=log_fn)


def cmd_train_vocos(args):
    from stabletts_tpu.config import VocosTrainConfig
    from stabletts_tpu.train.train_vocos import train_vocos

    cfg = VocosTrainConfig()
    cfg = dataclasses.replace(
        cfg,
        train_dataset_path=args.dataset or cfg.train_dataset_path,
        batch_size=args.batch_size or cfg.batch_size,
        model_save_path=args.save_path or cfg.model_save_path,
    )

    def log_fn(step, metrics):
        print(json.dumps({"step": step, **{k: float(v) for k, v in metrics.items()}}))

    train_vocos(cfg, num_epochs=args.epochs, log_fn=log_fn)


def cmd_preprocess_vocos(args):
    from stabletts_tpu.data.vocos_dataset import vocos_preprocess

    n = vocos_preprocess(args.input, args.output)
    print(f"found {n} audio files -> {args.output}")


def cmd_convert(args):
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    from stabletts_tpu.utils.convert import (
        load_torch_state_dict_numpy,
        torch_to_flax_ffgan,
        torch_to_flax_stabletts,
        torch_to_flax_vocos,
    )

    converter = {
        "stabletts": torch_to_flax_stabletts,
        "vocos": torch_to_flax_vocos,
        "ffgan": torch_to_flax_ffgan,
    }[args.kind]
    params = converter(load_torch_state_dict_numpy(args.input))
    n = sum(int(np.prod(p.shape)) for p in __import__("jax").tree_util.tree_leaves(params))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), params, force=True)
    ckptr.wait_until_finished()
    print(f"converted {args.kind}: {n/1e6:.2f}M params -> {args.output}")


def cmd_export(args):
    """Reverse conversion: orbax checkpoint -> reference torch .pt, so
    TPU-trained models run in the reference PyTorch stack (round-trip
    bit-exactness tested in tests/test_parity_stabletts.py)."""
    import os

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from stabletts_tpu.config import MelConfig, VocosConfig
    from stabletts_tpu.utils.convert import (
        flax_to_torch_stabletts,
        flax_to_torch_vocos,
        save_torch_checkpoint,
    )

    if args.kind == "stabletts":
        from stabletts_tpu.models import build_stabletts, init_stabletts_params

        template = init_stabletts_params(build_stabletts(), jax.random.PRNGKey(0))["params"]
        exporter = flax_to_torch_stabletts
    else:
        import jax.numpy as jnp

        from stabletts_tpu.models.vocos import Vocos

        model = Vocos(VocosConfig(), MelConfig())
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, MelConfig().n_mels))
        )["params"]
        exporter = flax_to_torch_vocos
    params = ocp.StandardCheckpointer().restore(os.path.abspath(args.input), template)
    sd = exporter(params)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    save_torch_checkpoint(sd, args.output)
    print(f"exported {args.kind}: {n/1e6:.2f}M params -> {args.output}")


def cmd_synth(args):
    from stabletts_tpu.api import StableTTSAPI
    from stabletts_tpu.utils.audio_io import save_wav

    api = StableTTSAPI(args.tts_ckpt, args.vocoder_ckpt, args.vocoder)
    tts_m, voc_m = api.get_params()
    print(f"tts: {tts_m:.1f}M params, vocoder: {voc_m:.1f}M params")
    wav, mel = api.inference(
        args.text, args.ref, args.language,
        step=args.steps, temperature=args.temperature,
        length_scale=args.length_scale, solver=args.solver, cfg=args.cfg,
    )
    save_wav(args.out, wav[0], api.mel_config.sample_rate)
    print(f"wrote {args.out} ({wav.shape[1] / api.mel_config.sample_rate:.2f}s)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="stabletts_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("preprocess", help="audio+text filelist -> mels + training filelist")
    pp.add_argument("--input", required=True, help="filelist of 'audio_path|text' lines")
    pp.add_argument("--output", default="filelists/filelist.json")
    pp.add_argument("--mel-dir", default="./mels")
    pp.add_argument("--language", default="chinese", choices=["chinese", "english", "japanese"])
    pp.set_defaults(fn=cmd_preprocess)

    pt = sub.add_parser("train", help="train the TTS acoustic model")
    pt.add_argument("--dataset")
    pt.add_argument("--batch-size", type=int)
    pt.add_argument("--epochs", type=int)
    pt.add_argument("--save-path")
    pt.add_argument("--lr", type=float)
    pt.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                    help="bf16 compute vs f32 master params (default f32, like the reference)")
    pt.add_argument("--remat", action="store_true",
                    help="rematerialize estimator blocks: ~1.64x step time for much less activation HBM")
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("train-vocos", help="train the Vocos GAN vocoder")
    pv.add_argument("--dataset")
    pv.add_argument("--batch-size", type=int)
    pv.add_argument("--epochs", type=int)
    pv.add_argument("--save-path")
    pv.set_defaults(fn=cmd_train_vocos)

    pvp = sub.add_parser("preprocess-vocos", help="scan an audio dir into a vocoder filelist")
    pvp.add_argument("--input", required=True, help="audio directory")
    pvp.add_argument("--output", default="filelists/filelist.txt")
    pvp.set_defaults(fn=cmd_preprocess_vocos)

    ps = sub.add_parser("synth", help="synthesise speech")
    ps.add_argument("--text", required=True)
    ps.add_argument("--ref", required=True, help="reference audio (voice to clone)")
    ps.add_argument("--language", default="english", choices=["chinese", "english", "japanese"])
    ps.add_argument("--tts-ckpt")
    ps.add_argument("--vocoder-ckpt")
    ps.add_argument("--vocoder", default="vocos", choices=["vocos", "ffgan"])
    ps.add_argument("--steps", type=int, default=10)
    ps.add_argument("--temperature", type=float, default=1.0)
    ps.add_argument("--length-scale", type=float, default=1.0)
    ps.add_argument("--solver", default="euler")
    ps.add_argument("--cfg", type=float, default=3.0)
    ps.add_argument("--out", default="output.wav")
    ps.set_defaults(fn=cmd_synth)

    pc = sub.add_parser("convert", help="convert a reference PyTorch checkpoint to orbax")
    pc.add_argument("--input", required=True, help="torch .pt/.ckpt state dict")
    pc.add_argument("--output", required=True, help="orbax checkpoint dir to write")
    pc.add_argument("--kind", default="stabletts", choices=["stabletts", "vocos", "ffgan"])
    pc.set_defaults(fn=cmd_convert)

    pe = sub.add_parser(
        "export", help="export an orbax checkpoint to a reference torch .pt"
    )
    pe.add_argument("--input", required=True, help="orbax checkpoint dir")
    pe.add_argument("--output", required=True, help="torch .pt file to write")
    pe.add_argument("--kind", default="stabletts", choices=["stabletts", "vocos"])
    pe.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
