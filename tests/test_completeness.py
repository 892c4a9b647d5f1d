"""Tests for the long-tail components: extra LR schedules, cn2an reverse,
AttnMelStyleEncoder, batched inference, vocos preprocess, language router."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_extra_schedules():
    from stabletts_tpu.train.scheduler import (
        cosine_with_restarts_warmup,
        inverse_sqrt_with_warmup,
        polynomial_with_warmup,
        warmup_stable_decay,
    )

    total = 1000
    for sched in [
        cosine_with_restarts_warmup(1e-3, 10, total, num_cycles=2),
        polynomial_with_warmup(1e-3, 10, total),
        warmup_stable_decay(1e-3, 10, total),
        inverse_sqrt_with_warmup(1e-3, 10),
    ]:
        vals = [float(sched(s)) for s in [0, 5, 10, 500, 999]]
        assert vals[0] == 0.0
        assert vals[2] == pytest.approx(1e-3, rel=1e-5)
        assert all(v >= 0 for v in vals)
    wsd = warmup_stable_decay(1e-3, 10, total)
    assert float(wsd(500)) == pytest.approx(1e-3)  # stable plateau
    assert float(wsd(999)) < 2e-5  # decaying tail


def test_cn2an_reverse():
    from stabletts_tpu.text.numbers_zh import an2cn, cn2an_number

    for n in [0, 7, 10, 15, 23, 100, 105, 110, 999, 1000, 1001, 10086, 654321, 100000000]:
        assert cn2an_number(an2cn(str(n))) == n, n
    assert cn2an_number("两百") == 200
    assert cn2an_number("三点一四") == pytest.approx(3.14)
    assert cn2an_number("负七") == -7


def test_attn_mel_style_encoder():
    from stabletts_tpu.models.reference_encoder import AttnMelStyleEncoder

    m = AttnMelStyleEncoder(n_mel_channels=16, style_hidden=32, style_vector_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 16))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 64)
    mask = jnp.ones((2, 20)).at[1, 10:].set(0)
    out_m = m.apply(v, x, mask)
    assert out_m.shape == (2, 64)
    assert np.isfinite(np.asarray(out_m)).all()


def test_vocos_preprocess(tmp_path):
    from stabletts_tpu.data.vocos_dataset import vocos_preprocess

    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.wav").write_bytes(b"")
    (tmp_path / "y.flac").write_bytes(b"")
    (tmp_path / "skip.txt").write_bytes(b"")
    out = tmp_path / "fl.txt"
    n = vocos_preprocess(str(tmp_path), str(out))
    assert n == 2
    lines = out.read_text().splitlines()
    assert len(lines) == 2 and all(l.endswith((".wav", ".flac")) for l in lines)


def test_language_router():
    from stabletts_tpu.text.router import auto_g2p, detect_language

    assert detect_language("hello world") == "english"
    assert detect_language("你好世界") == "chinese"
    assert detect_language("こんにちは") == "japanese"
    phones = auto_g2p("你好 world")
    assert len(phones) > 0
    # chinese part produces tone-numbered phones, english part IPA
    assert any(p[-1].isdigit() for p in phones)


def test_batch_inference(tmp_path):
    from scipy.io import wavfile

    from stabletts_tpu.api import StableTTSAPI

    sr = 44100
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.linspace(0, 1, sr))).astype(np.float32)
    ref = tmp_path / "ref.wav"
    wavfile.write(ref, sr, (wav * 32767).astype(np.int16))

    api = StableTTSAPI()
    outs = api.batch_inference(
        [("Hello.", "english"), ("你好。", "chinese")],
        str(ref), step=2, cfg=1.0, max_mel_len=128,
    )
    assert len(outs) == 2
    for o in outs:
        assert o.ndim == 1 and len(o) % 512 == 0
        assert np.isfinite(o).all()
