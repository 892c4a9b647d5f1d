"""High-level inference API (reference: api.py:38-83).

StableTTSAPI(tts_ckpt, vocoder_ckpt, vocoder_name).inference(text, ref_audio,
language, ...) -> (waveform, mel). Checkpoints may be native orbax directories
(from this framework's training) or reference PyTorch .pt files (converted on
load; requires torch).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from stabletts_tpu.config import MelConfig, ModelConfig, VocosConfig
from stabletts_tpu.models import build_stabletts, init_stabletts_params
from stabletts_tpu.models.ffgan import FireflyGANBase
from stabletts_tpu.models.sampler import synthesise
from stabletts_tpu.models.vocos import Vocos
from stabletts_tpu.ops.stft import log_mel_spectrogram
from stabletts_tpu.text import cleaned_text_to_sequence, intersperse, symbols
from stabletts_tpu.text.english import english_to_ipa2
from stabletts_tpu.text.japanese import japanese_to_ipa2
from stabletts_tpu.text.mandarin import chinese_to_cnm3
from stabletts_tpu.utils.audio_io import load_and_resample_audio


def _enable_compilation_cache():
    """Persistent XLA compilation cache for serving cold starts: the first
    synthesise compile takes 15-160 s on the tunneled TPU compile service;
    cache hits skip it across process restarts. No-op if already set or
    unsupported. Opt out with STABLETTS_NO_COMPILE_CACHE=1."""
    if os.environ.get("STABLETTS_NO_COMPILE_CACHE") == "1":
        return
    try:
        if jax.config.jax_compilation_cache_dir:
            return
        cache_dir = os.path.expanduser("~/.cache/stabletts_jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _load_params(path: str, template, torch_converter):
    """Load params from an orbax dir or a torch .pt state dict."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(os.path.abspath(path), template)
    from stabletts_tpu.utils.convert import load_torch_state_dict_numpy

    return torch_converter(load_torch_state_dict_numpy(path))


def get_vocoder(model_path: str, model_name: str = "ffgan"):
    """(reference: api.py:19-36). Returns (module, variables)."""
    mel_cfg = MelConfig()
    if model_name == "ffgan":
        from stabletts_tpu.utils.convert import torch_to_flax_ffgan

        model = FireflyGANBase()
        dummy = jnp.zeros((1, 8, mel_cfg.n_mels))
        template = model.init(jax.random.PRNGKey(0), dummy)["params"]
        params = _load_params(model_path, template, torch_to_flax_ffgan)
        return model, {"params": params}
    if model_name == "vocos":
        from stabletts_tpu.utils.convert import torch_to_flax_vocos

        model = Vocos(VocosConfig(), mel_cfg)
        dummy = jnp.zeros((1, 8, mel_cfg.n_mels))
        template = model.init(jax.random.PRNGKey(0), dummy)["params"]
        params = _load_params(model_path, template, torch_to_flax_vocos)
        return model, {"params": params}
    raise NotImplementedError(f"Unsupported vocoder: {model_name}")


class StableTTSAPI:
    def __init__(
        self,
        tts_model_path: Optional[str] = None,
        vocoder_model_path: Optional[str] = None,
        vocoder_name: str = "ffgan",
        model_config: Optional[ModelConfig] = None,
        mel_config: Optional[MelConfig] = None,
        vocos_config: Optional[VocosConfig] = None,
        max_mel_len: int = 1024,
    ):
        """Configs default to the reference's flagship (31M) settings; pass
        custom ones for smaller/larger models (the reference hard-codes its
        configs in config.py — this is an intentional extension)."""
        _enable_compilation_cache()
        self.mel_config = mel_config or MelConfig()
        self.tts_model_config = model_config or ModelConfig()
        self._vocos_config = vocos_config or VocosConfig()
        self._default_max_mel_len = max_mel_len

        self.tts_model = build_stabletts(self.tts_model_config, self.mel_config)
        template = init_stabletts_params(self.tts_model, jax.random.PRNGKey(0))["params"]
        if tts_model_path is not None:
            from stabletts_tpu.utils.convert import torch_to_flax_stabletts

            params = _load_params(tts_model_path, template, torch_to_flax_stabletts)
        else:
            params = template  # random init (useful for smoke/testing)
        self.tts_variables = {"params": params}

        if vocoder_model_path is not None:
            self.vocoder_model, self.vocoder_variables = get_vocoder(
                vocoder_model_path, vocoder_name
            )
        else:
            self.vocoder_model = Vocos(self._vocos_config, self.mel_config)
            self.vocoder_variables = self.vocoder_model.init(
                jax.random.PRNGKey(1), jnp.zeros((1, 8, self.mel_config.n_mels))
            )
        if (
            isinstance(self.vocoder_model, Vocos)
            and jax.devices()[0].platform == "tpu"
        ):
            from stabletts_tpu.models.vocos import vocos_apply_fused

            self._vocoder_apply = jax.jit(
                lambda v, m: vocos_apply_fused(self.vocoder_model, v, m)
            )
        else:
            self._vocoder_apply = jax.jit(self.vocoder_model.apply)

        self.g2p_mapping = {
            "chinese": chinese_to_cnm3,
            "japanese": japanese_to_ipa2,
            "english": english_to_ipa2,
        }
        self.supported_languages = self.g2p_mapping.keys()

    def inference(
        self,
        text: str,
        ref_audio: str | np.ndarray,
        language: str,
        step: int = 10,
        temperature: float = 1.0,
        length_scale: float = 1.0,
        solver: str = "euler",
        cfg: float = 3.0,
        max_mel_len: Optional[int] = None,
        seed: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """text + reference audio -> (waveform [1, T_wav], mel [1, n_mels, T])
        (reference: api.py:63-77; mel returned in the reference's [B, C, T]
        layout for drop-in compatibility)."""
        max_mel_len = max_mel_len or self._default_max_mel_len
        phonemizer = self.g2p_mapping.get(language)
        if phonemizer is None:
            raise ValueError(f"language {language!r} not in {list(self.supported_languages)}")

        phones = phonemizer(text)
        ids = intersperse(cleaned_text_to_sequence(phones), 0)
        x = jnp.asarray([ids], dtype=jnp.int32)
        x_lengths = jnp.asarray([len(ids)], dtype=jnp.int32)

        if isinstance(ref_audio, str):
            wav = load_and_resample_audio(ref_audio, self.mel_config.sample_rate)
            if wav is None:
                raise ValueError(f"could not load reference audio {ref_audio}")
        else:
            wav = np.asarray(ref_audio, dtype=np.float32)
        ref_mel = log_mel_spectrogram(jnp.asarray(wav)[None, :], self.mel_config)

        while True:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (1, max_mel_len, self.mel_config.n_mels)
            )
            out = synthesise(
                self.tts_model, self.tts_variables, x, x_lengths, noise, ref_mel,
                n_timesteps=step, temperature=temperature, length_scale=length_scale,
                solver=solver, cfg=cfg, max_mel_len=max_mel_len,
            )
            y_len = int(out["y_lengths"][0])
            # predicted length hit the static cap: regrow and resynthesize
            if y_len < max_mel_len or max_mel_len >= 8192:
                break
            max_mel_len *= 2
        mel = out["decoder_outputs"][:, :y_len, :]  # [1, T, n_mels]
        audio = self._vocoder_apply(self.vocoder_variables, mel)
        return np.asarray(audio), np.asarray(mel).transpose(0, 2, 1)

    def batch_inference(
        self,
        items: list,
        ref_audio: str | np.ndarray,
        step: int = 10,
        temperature: float = 1.0,
        length_scale: float = 1.0,
        solver: str = "euler",
        cfg: float = 3.0,
        max_mel_len: Optional[int] = None,
        seed: int = 0,
    ) -> list:
        """Batched multilingual inference: items is a list of (text, language)
        pairs sharing one reference voice; one jitted synthesise + vocoder
        call covers the whole batch. Returns a list of waveforms.

        Text lengths are padded to a shared shape; outputs are trimmed per
        item by the predicted durations. Like inference(), the static mel cap
        regrows (x2, whole batch) when any item's predicted length hits it.
        """
        max_mel_len = max_mel_len or self._default_max_mel_len
        id_lists = []
        for text, language in items:
            phonemizer = self.g2p_mapping.get(language)
            if phonemizer is None:
                raise ValueError(f"language {language!r} not supported")
            id_lists.append(intersperse(cleaned_text_to_sequence(phonemizer(text)), 0))
        b = len(id_lists)
        tx = max(len(ids) for ids in id_lists)
        x = np.zeros((b, tx), dtype=np.int32)
        x_lengths = np.zeros((b,), dtype=np.int32)
        for i, ids in enumerate(id_lists):
            x[i, : len(ids)] = ids
            x_lengths[i] = len(ids)

        if isinstance(ref_audio, str):
            wav = load_and_resample_audio(ref_audio, self.mel_config.sample_rate)
            if wav is None:
                raise ValueError(f"could not load reference audio {ref_audio}")
        else:
            wav = np.asarray(ref_audio, dtype=np.float32)
        ref_mel = log_mel_spectrogram(jnp.asarray(wav)[None, :], self.mel_config)
        ref_mel = jnp.broadcast_to(ref_mel, (b,) + ref_mel.shape[1:])

        while True:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (b, max_mel_len, self.mel_config.n_mels)
            )
            out = synthesise(
                self.tts_model, self.tts_variables, jnp.asarray(x), jnp.asarray(x_lengths),
                noise, ref_mel, n_timesteps=step, temperature=temperature,
                length_scale=length_scale, solver=solver, cfg=cfg, max_mel_len=max_mel_len,
            )
            # any item clamped at the cap -> regrow and resynthesize (same
            # semantics as inference(); without this long items are silently
            # truncated mid-sentence)
            if int(np.asarray(out["y_lengths"]).max()) < max_mel_len or max_mel_len >= 8192:
                break
            max_mel_len *= 2
        audio = np.asarray(self._vocoder_apply(self.vocoder_variables, out["decoder_outputs"]))
        y_lengths = np.asarray(out["y_lengths"])
        hop = self.mel_config.hop_length
        return [audio[i, : y_lengths[i] * hop] for i in range(b)]

    def get_params(self) -> Tuple[float, float]:
        """(tts_params_M, vocoder_params_M) (reference: api.py:79-82)."""
        count = lambda tree: sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))
        return (
            count(self.tts_variables["params"]) / 1e6,
            count(self.vocoder_variables["params"]) / 1e6,
        )
