"""High-level inference API (reference: api.py:38-83).

StableTTSAPI(tts_ckpt, vocoder_ckpt, vocoder_name).inference(text, ref_audio,
language, ...) -> (waveform, mel). Checkpoints may be native orbax directories
(from this framework's training) or reference PyTorch .pt files (converted on
load; requires torch).
"""

from __future__ import annotations

import logging
import os
import re
import time
from typing import Optional, Sequence, Tuple

logger = logging.getLogger("stabletts.api")

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
        warmup_lengths: Optional[Sequence[int]] = None,
    ):
        """Configs default to the reference's flagship (31M) settings; pass
        custom ones for smaller/larger models (the reference hard-codes its
        configs in config.py — this is an intentional extension).

        warmup_lengths: serving shape ladder, e.g. (1024, 2048). When set,
        text/reference shapes are quantized to fixed buckets and warmup()
        pre-compiles synthesise at each mel cap, so long requests that regrow
        past max_mel_len (or requests with new text lengths) hit a warm
        compile cache instead of stalling 15-160 s at request time."""
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
        # _vocoder_apply(variables, mel, lengths): lengths enables the
        # fixed-shape serving mode (Vocos only — ffgan callers trim instead)
        self._vocoder_supports_lengths = isinstance(self.vocoder_model, Vocos)
        if (
            isinstance(self.vocoder_model, Vocos)
            and jax.devices()[0].platform == "tpu"
        ):
            from stabletts_tpu.models.vocos import vocos_apply_fused

            self._vocoder_apply = jax.jit(
                lambda v, m, lens=None: vocos_apply_fused(
                    self.vocoder_model, v, m, lengths=lens
                )
            )
        elif isinstance(self.vocoder_model, Vocos):
            self._vocoder_apply = jax.jit(
                lambda v, m, lens=None: self.vocoder_model.apply(v, m, lens)
            )
        else:
            self._vocoder_apply = jax.jit(
                lambda v, m, lens=None: self.vocoder_model.apply(v, m)
            )

        from stabletts_tpu.text.router import auto_g2p

        self.g2p_mapping = {
            "chinese": chinese_to_cnm3,
            "japanese": japanese_to_ipa2,
            "english": english_to_ipa2,
            # mixed-language routing (the working version of the reference's
            # dead cjke auto-cleaner, text/cleaners.py:30-58)
            "auto": auto_g2p,
        }
        self.supported_languages = self.g2p_mapping.keys()

        self._shape_ladder = warmup_lengths is not None
        self._compiled_keys: set = set()
        if warmup_lengths:
            self.warmup(tuple(warmup_lengths))

    # --- serving shape ladder -------------------------------------------
    # Every distinct (text_len, ref_len, mel_cap) triple is a fresh XLA
    # compile (15-160 s through the tunneled compile service). Quantizing
    # text to 64-id and reference mels to 512-frame buckets collapses the
    # request space onto a small grid that warmup() can pre-compile; masks
    # (x_lengths / y_ref_mask) keep the computation exact on the padding.
    _TEXT_BUCKET = 64
    _REF_BUCKET = 512

    @staticmethod
    def _round_up(n: int, m: int) -> int:
        return max(m, -(-n // m) * m)

    def _bucket_text(self, ids: list) -> tuple:
        if not self._shape_ladder:
            return ids, len(ids)
        padded = ids + [0] * (self._round_up(len(ids), self._TEXT_BUCKET) - len(ids))
        return padded, len(ids)

    def _bucket_ref(self, ref_mel: jnp.ndarray):
        """[1, Tref, n_mels] -> (padded mel, mask or None)."""
        if not self._shape_ladder:
            return ref_mel, None
        t = ref_mel.shape[1]
        t_pad = self._round_up(t, self._REF_BUCKET)
        if t_pad != t:
            ref_mel = jnp.pad(ref_mel, ((0, 0), (0, t_pad - t), (0, 0)))
        mask = (jnp.arange(t_pad)[None, :] < t).astype(jnp.float32)
        return ref_mel, mask

    def _log_compile_key(self, key: tuple, kind: str) -> None:
        if key not in self._compiled_keys:
            self._compiled_keys.add(key)
            logger.info("%s: new jit shape key %s (may compile)", kind, key)

    def warmup(
        self,
        lengths: Sequence[int] = (1024, 2048),
        text_buckets: Sequence[int] = (64, 128),
        ref_buckets: Sequence[int] = (512,),
        step: int = 10,
        solver: str = "euler",
        cfg: float = 3.0,
    ) -> float:
        """Pre-compiles the synthesise + vocoder pipeline over the shape grid
        so no request on the grid pays a compile. Returns wall seconds spent.
        With the persistent compilation cache enabled this is fast after the
        first-ever process start."""
        self._shape_ladder = True
        t0 = time.time()
        for tref in ref_buckets:
            ref_mel = jnp.zeros((1, tref, self.mel_config.n_mels), jnp.float32)
            ref_mask = jnp.ones((1, tref), jnp.float32)
            for tx in text_buckets:
                x = jnp.zeros((1, tx), jnp.int32)
                x_lengths = jnp.asarray([min(8, tx)], jnp.int32)
                for cap in lengths:
                    logger.info("warmup: compiling tx=%d tref=%d cap=%d", tx, tref, cap)
                    noise = jnp.zeros((1, cap, self.mel_config.n_mels), jnp.float32)
                    out = synthesise(
                        self.tts_model, self.tts_variables, x, x_lengths, noise,
                        ref_mel, n_timesteps=step, solver=solver, cfg=cfg,
                        max_mel_len=cap, y_ref_mask=ref_mask,
                    )
                    jax.block_until_ready(out["decoder_outputs"])
                    self._compiled_keys.add((1, tx, tref, cap, step, solver, cfg))
                    # vocoder at the full cap with a length mask — the exact
                    # call shape inference() issues in ladder mode
                    lens = out["y_lengths"] if self._vocoder_supports_lengths else None
                    jax.block_until_ready(self._vocoder_apply(
                        self.vocoder_variables, out["decoder_outputs"], lens))
        dt = time.time() - t0
        logger.info("warmup: done in %.1f s (%d keys)", dt, len(self._compiled_keys))
        return dt

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
        ids, true_len = self._bucket_text(ids)
        x = jnp.asarray([ids], dtype=jnp.int32)
        x_lengths = jnp.asarray([true_len], dtype=jnp.int32)

        if isinstance(ref_audio, str):
            wav = load_and_resample_audio(ref_audio, self.mel_config.sample_rate)
            if wav is None:
                raise ValueError(f"could not load reference audio {ref_audio}")
        else:
            wav = np.asarray(ref_audio, dtype=np.float32)
        ref_mel = log_mel_spectrogram(jnp.asarray(wav)[None, :], self.mel_config)
        ref_mel, ref_mask = self._bucket_ref(ref_mel)

        while True:
            self._log_compile_key(
                (1, x.shape[1], ref_mel.shape[1], max_mel_len, step, solver, cfg),
                "inference",
            )
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (1, max_mel_len, self.mel_config.n_mels)
            )
            out = synthesise(
                self.tts_model, self.tts_variables, x, x_lengths, noise, ref_mel,
                n_timesteps=step, temperature=temperature, length_scale=length_scale,
                solver=solver, cfg=cfg, max_mel_len=max_mel_len, y_ref_mask=ref_mask,
            )
            y_len = int(out["y_lengths"][0])
            # predicted length exceeded the static cap: regrow and resynthesize
            # (explicit flag, not y_len == cap — a prediction that exactly
            # fits must not pay a 2x-shape recompile)
            if not bool(out["y_clamped"][0]) or max_mel_len >= 8192:
                break
            max_mel_len *= 2
            logger.warning(
                "inference: predicted length exceeded the mel cap; regrowing "
                "to %d and resynthesizing (expect a compile unless warmed)",
                max_mel_len,
            )
        if self._shape_ladder and self._vocoder_supports_lengths:
            # fixed-shape vocoder: full cap + per-item length mask (exact —
            # see Vocos.__call__), so no per-length vocoder recompile
            audio = self._vocoder_apply(
                self.vocoder_variables, out["decoder_outputs"],
                jnp.asarray([y_len], jnp.int32),
            )
            audio = np.asarray(audio)[:, : y_len * self.mel_config.hop_length]
        else:
            audio = np.asarray(self._vocoder_apply(
                self.vocoder_variables, out["decoder_outputs"][:, :y_len, :], None
            ))
        mel = out["decoder_outputs"][:, :y_len, :]  # [1, T, n_mels]
        return audio, np.asarray(mel).transpose(0, 2, 1)

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
        if self._shape_ladder:
            tx = self._round_up(tx, self._TEXT_BUCKET)
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
        ref_mel, ref_mask = self._bucket_ref(ref_mel)
        ref_mel = jnp.broadcast_to(ref_mel, (b,) + ref_mel.shape[1:])
        if ref_mask is not None:
            ref_mask = jnp.broadcast_to(ref_mask, (b,) + ref_mask.shape[1:])

        while True:
            self._log_compile_key(
                (b, tx, ref_mel.shape[1], max_mel_len, step, solver, cfg),
                "batch_inference",
            )
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (b, max_mel_len, self.mel_config.n_mels)
            )
            out = synthesise(
                self.tts_model, self.tts_variables, jnp.asarray(x), jnp.asarray(x_lengths),
                noise, ref_mel, n_timesteps=step, temperature=temperature,
                length_scale=length_scale, solver=solver, cfg=cfg, max_mel_len=max_mel_len,
                y_ref_mask=ref_mask,
            )
            # any item's prediction exceeded the cap -> regrow and
            # resynthesize (same semantics as inference(); without this long
            # items are silently truncated mid-sentence)
            if not bool(np.asarray(out["y_clamped"]).any()) or max_mel_len >= 8192:
                break
            max_mel_len *= 2
            logger.warning(
                "batch_inference: an item exceeded the mel cap; regrowing to "
                "%d and resynthesizing the whole batch", max_mel_len,
            )
        lens = out["y_lengths"] if self._vocoder_supports_lengths else None
        audio = np.asarray(self._vocoder_apply(
            self.vocoder_variables, out["decoder_outputs"], lens))
        y_lengths = np.asarray(out["y_lengths"])
        hop = self.mel_config.hop_length
        return [audio[i, : y_lengths[i] * hop] for i in range(b)]

    # --- long-text serving ----------------------------------------------
    # The synthesise mel cap tops out at 8192 frames (~95 s); the reference
    # simply truncates longer requests (it has no chunking either). Long
    # texts are split into sentence chunks, synthesized in ONE batched call
    # sharing the reference voice (so speaker identity is consistent), and
    # joined with a short equal-power crossfade to avoid boundary clicks.

    _SENT_SPLIT = re.compile(r"(?<=[.!?;。！？；…])\s*")
    _CLAUSE_SPLIT = re.compile(r"(?<=[,:、，：])\s*")

    @classmethod
    def _split_sentences(cls, text: str, max_chars: int) -> list:
        """Sentence-split `text`, then greedily merge tiny sentences and
        clause-split (then hard-split) any single piece over max_chars."""
        pieces = [s for s in cls._SENT_SPLIT.split(text.strip()) if s.strip()]
        atomic: list = []
        for s in pieces:
            if len(s) <= max_chars:
                atomic.append(s)
                continue
            clauses = [c for c in cls._CLAUSE_SPLIT.split(s) if c.strip()]
            for c in clauses:
                while len(c) > max_chars:  # pathological unpunctuated runs
                    cut = c.rfind(" ", 0, max_chars)
                    cut = cut if cut > max_chars // 2 else max_chars
                    atomic.append(c[:cut])
                    c = c[cut:].lstrip()
                if c:
                    atomic.append(c)
        chunks: list = []
        for s in atomic:
            if chunks and len(chunks[-1]) + len(s) + 1 <= max_chars:
                sep = "" if not chunks[-1][-1:].isascii() else " "
                chunks[-1] = chunks[-1] + sep + s
            else:
                chunks.append(s)
        return chunks

    def inference_long(
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
        max_chars_per_chunk: Optional[int] = None,
        crossfade_ms: float = 40.0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Arbitrary-length text -> (waveform [1, T_wav], mel [1, n_mels, T]).

        Unlike inference(), there is no effective length limit: the text is
        sentence-chunked (each chunk well under the 8192-frame synthesise
        cap), all chunks are synthesized in one batched call with the same
        reference voice, and the waveforms are joined with an equal-power
        crossfade. The reference stack truncates at its mel cap instead —
        this is an extension, not a parity surface."""
        if max_chars_per_chunk is None:
            # ~12 chars/s read-aloud English, ~4 chars/s zh/ja: keep each
            # chunk around 20-30 s of audio, far under the 95 s cap
            max_chars_per_chunk = 300 if language == "english" else 100
        chunks = self._split_sentences(text, max_chars_per_chunk)
        if not chunks:
            raise ValueError("no synthesizable text after splitting")
        if len(chunks) == 1:
            wav, mel = self.inference(
                chunks[0], ref_audio, language, step=step, temperature=temperature,
                length_scale=length_scale, solver=solver, cfg=cfg,
                max_mel_len=max_mel_len, seed=seed,
            )
            return wav, mel
        logger.info("inference_long: %d chunks", len(chunks))
        wavs = self.batch_inference(
            [(c, language) for c in chunks], ref_audio, step=step,
            temperature=temperature, length_scale=length_scale, solver=solver,
            cfg=cfg, max_mel_len=max_mel_len, seed=seed,
        )
        xfade = int(self.mel_config.sample_rate * crossfade_ms / 1000.0)
        out = wavs[0].astype(np.float32)
        for w in wavs[1:]:
            w = w.astype(np.float32)
            n = min(xfade, len(out), len(w))
            if n > 0:
                t = np.linspace(0.0, np.pi / 2, n, dtype=np.float32)
                out = np.concatenate(
                    [out[:-n], out[-n:] * np.cos(t) ** 2 + w[:n] * np.sin(t) ** 2, w[n:]]
                )
            else:
                out = np.concatenate([out, w])
        # mel for plotting/debug: plain concat of per-chunk mels is not
        # returned chunk-accurate under crossfade; recompute from audio
        mel = log_mel_spectrogram(jnp.asarray(out)[None, :], self.mel_config)
        return out[None, :], np.asarray(mel).transpose(0, 2, 1)

    def get_params(self) -> Tuple[float, float]:
        """(tts_params_M, vocoder_params_M) (reference: api.py:79-82)."""
        count = lambda tree: sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))
        return (
            count(self.tts_variables["params"]) / 1e6,
            count(self.vocoder_variables["params"]) / 1e6,
        )
