"""Configuration dataclasses — single source of truth for model/audio/train hyperparameters.

Semantics mirror the reference StableTTS config (reference: config.py:1-50) so that
converted PyTorch checkpoints line up, but the dataclasses here are frozen and
hashable so they can be passed as static arguments through `jax.jit`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass(frozen=True)
class MelConfig:
    """Log-mel spectrogram front-end config (reference: config.py:3-19).

    `pad` defaults to (n_fft - hop_length) // 2 which gives "same"-style framing:
    an audio of N samples yields ceil(N / hop_length) frames.
    """

    sample_rate: int = 44100
    n_fft: int = 2048
    win_length: int = 2048
    hop_length: int = 512
    f_min: float = 0.0
    f_max: Optional[float] = None
    pad: int = 0
    n_mels: int = 128
    center: bool = False
    pad_mode: str = "reflect"
    mel_scale: str = "slaney"

    def __post_init__(self):
        if self.pad == 0:
            object.__setattr__(self, "pad", (self.n_fft - self.hop_length) // 2)

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length


@dataclass(frozen=True)
class ModelConfig:
    """StableTTS acoustic model config (reference: config.py:21-30)."""

    hidden_channels: int = 256
    filter_channels: int = 1024
    n_heads: int = 4
    n_enc_layers: int = 3
    n_dec_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 256
    # rematerialize each estimator block in backward (jax.checkpoint): trades
    # ~1 extra forward of FLOPs for O(n_layers) less activation HBM — enables
    # larger batches / longer sequences in training. No effect on inference
    # or on the checkpoint tree. The reference has no such option.
    remat: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """TTS training config (reference: config.py:32-43)."""

    train_dataset_path: str = "filelists/filelist.json"
    batch_size: int = 32
    learning_rate: float = 1e-4
    num_epochs: int = 10000
    model_save_path: str = "./checkpoints"
    log_dir: str = "./runs"
    log_interval: int = 16
    save_interval: int = 1
    warmup_steps: int = 200
    # TPU-specific additions (no reference equivalent):
    seed: int = 0
    bucket_boundaries: Tuple[int, ...] = (32, 300, 400, 500, 600, 700, 800, 900, 1000)
    max_text_len: int = 512
    compute_dtype: str = "float32"  # or "bfloat16"
    # async input pipeline (reference: train.py:55 DataLoader num_workers=4);
    # loader_workers=0 disables prefetch (synchronous loading, for debugging)
    loader_workers: int = 4
    prefetch_depth: int = 8
    # ship mel/ref-mel batches to the device as float16 (half the H2D
    # bytes; widened to f32/bf16 on-device at step entry). Useful when the
    # host->device link is the bottleneck — measured on the tunneled dev
    # backend: 467 -> 273 ms/step at B=32 (see DESIGN.md "Input-pipeline
    # H2D"); inputs are quantized to f16 (~1e-3 relative), so default off.
    transfer_dtype: str = "float32"  # or "float16"


@dataclass(frozen=True)
class VocosConfig:
    """Vocos generator config. Inference default (reference: config.py:45-50).

    The reference's vocos *training* tree uses dim=768 / intermediate_dim=2048 /
    num_layers=12 (reference: vocoders/vocos/config.py:21-26).
    """

    input_channels: int = 128
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8


@dataclass(frozen=True)
class VocosTrainConfig:
    """Vocos GAN training config (reference: vocoders/vocos/config.py:28-47)."""

    train_dataset_path: str = "filelists/filelist.txt"
    segment_size: int = 20480
    batch_size: int = 16
    learning_rate: float = 1e-4
    num_epochs: int = 10000
    model_save_path: str = "./checkpoints_vocos"
    log_dir: str = "./runs_vocos"
    log_interval: int = 64
    save_interval: int = 1
    warmup_steps: int = 200
    mel_loss_coeff: float = 15.0
    grad_clip: float = 1000.0
    seed: int = 0
    # TPU extension (reference trains pure fp32): bf16 compute with f32
    # master params/optimizer; mel-loss STFTs stay f32
    compute_dtype: str = "float32"  # or "bfloat16"
    loader_workers: int = 4
    prefetch_depth: int = 8
    # ship mel/ref-mel batches to the device as float16 (half the H2D
    # bytes; widened to f32/bf16 on-device at step entry). Useful when the
    # host->device link is the bottleneck — measured on the tunneled dev
    # backend: 467 -> 273 ms/step at B=32 (see DESIGN.md "Input-pipeline
    # H2D"); inputs are quantized to f16 (~1e-3 relative), so default off.
    transfer_dtype: str = "float32"  # or "float16"


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)
