"""Web UI (stabletts_tpu/webui.py): serve the page and run a synthesis
round-trip over real HTTP against a random-weight API (tiny config)."""

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest

from stabletts_tpu.webui import (
    SOLVERS,
    make_handler,
    remove_newlines_after_punctuation,
)


def test_newline_cleanup():
    # reference webui.py:48-50 behavior: strip newline right after punctuation
    assert remove_newlines_after_punctuation("你好。\n世界") == "你好。世界"
    assert remove_newlines_after_punctuation("a,\nb\nc") == "a,b\nc"


def test_solver_dropdown_covers_reference():
    for s in ["euler", "midpoint", "dopri5"]:  # recommended set (webui.py:110)
        assert s in SOLVERS
    assert len(SOLVERS) >= 8  # reference exposes 8 solvers


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    from stabletts_tpu.api import StableTTSAPI
    from stabletts_tpu.config import ModelConfig, VocosConfig

    api = StableTTSAPI(
        None, None, "vocos",
        model_config=ModelConfig(
            hidden_channels=32, filter_channels=64, n_heads=2,
            n_enc_layers=1, n_dec_layers=2, kernel_size=3,
            p_dropout=0.1, gin_channels=32,
        ),
        vocos_config=VocosConfig(dim=32, intermediate_dim=64, num_layers=1),
        max_mel_len=128,
    )
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(api))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _ref_wav_b64(sr=44100, seconds=0.6):
    from stabletts_tpu.utils.audio_io import save_wav

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(int(sr * seconds))).astype(np.float32)
    buf = io.BytesIO()
    save_wav(buf, wav, sr)
    return base64.b64encode(buf.getvalue()).decode()


def test_page_serves(server):
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/")
    r = conn.getresponse()
    body = r.read().decode()
    assert r.status == 200
    assert "StableTTS" in body and "dopri5" in body


def test_synthesize_roundtrip(server):
    host, port = server
    req = {
        "text": "Hello world.",
        "language": "english",
        "solver": "euler",
        "step": 2,
        "cfg": 1.0,
        "temperature": 1.0,
        "length_scale": 1.0,
        "ref_audio_b64": _ref_wav_b64(),
    }
    conn = http.client.HTTPConnection(host, port, timeout=600)
    conn.request("POST", "/synthesize", body=json.dumps(req))
    r = conn.getresponse()
    assert r.status == 200, r.read()[:200]
    out = json.loads(r.read())
    wav = base64.b64decode(out["wav_b64"])
    assert wav[:4] == b"RIFF" and out["seconds"] > 0
