"""ISTFT "same"-padding tests: numerics vs a torch re-derivation of the
reference implementation (vocoders/vocos/models/head.py:31-73) and STFT
round-trip reconstruction."""

import numpy as np
import jax.numpy as jnp
import pytest

from stabletts_tpu.ops.istft import istft_same, overlap_add
from stabletts_tpu.ops.stft import hann_window

torch = pytest.importorskip("torch")


def _torch_ref_istft(spec_np, n_fft, hop, win):
    """Reference custom ISTFT numerics (head.py:49-73), torch implementation."""
    spec = torch.from_numpy(spec_np)  # [B, N, T] complex
    window = torch.hann_window(win)
    pad = (win - hop) // 2
    B, N, T = spec.shape
    ifft = torch.fft.irfft(spec, n_fft, dim=1, norm="backward")
    ifft = ifft * window[None, :, None]
    output_size = (T - 1) * hop + win
    y = torch.nn.functional.fold(
        ifft, output_size=(1, output_size), kernel_size=(1, win), stride=(1, hop),
    )[:, 0, 0, pad:-pad]
    window_sq = window.square().expand(1, T, -1).transpose(1, 2)
    window_envelope = torch.nn.functional.fold(
        window_sq, output_size=(1, output_size), kernel_size=(1, win), stride=(1, hop),
    ).squeeze()[pad:-pad]
    assert (window_envelope > 1e-11).all()
    return (y / window_envelope).numpy()


def test_overlap_add_matches_scatter():
    rng = np.random.default_rng(0)
    frames = rng.standard_normal((2, 7, 2048)).astype(np.float32)
    fast = np.asarray(overlap_add(jnp.asarray(frames), 512))
    # naive scatter oracle
    out = np.zeros((2, 6 * 512 + 2048), dtype=np.float32)
    for t in range(7):
        out[:, t * 512 : t * 512 + 2048] += frames[:, t]
    np.testing.assert_allclose(fast, out, rtol=1e-6, atol=1e-5)


def test_istft_matches_reference_torch():
    n_fft, hop, win = 2048, 512, 2048
    rng = np.random.default_rng(1)
    T = 20
    mag = np.exp(rng.standard_normal((2, n_fft // 2 + 1, T))).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, (2, n_fft // 2 + 1, T)).astype(np.float32)
    spec = (mag * (np.cos(phase) + 1j * np.sin(phase))).astype(np.complex64)

    ref = _torch_ref_istft(spec, n_fft, hop, win)
    got = np.asarray(istft_same(jnp.asarray(spec.transpose(0, 2, 1)), n_fft, hop, win))
    assert got.shape == ref.shape == (2, T * hop)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_istft_matmul_matches_fft_path():
    """istft_same_real (MXU matmul iDFT) == istft_same (irfft path)."""
    from stabletts_tpu.ops.istft import istft_same_real

    n_fft, hop, win = 2048, 512, 2048
    rng = np.random.default_rng(3)
    T = 12
    re = rng.standard_normal((2, T, n_fft // 2 + 1)).astype(np.float32)
    im = rng.standard_normal((2, T, n_fft // 2 + 1)).astype(np.float32)
    spec = (re + 1j * im).astype(np.complex64)
    ref = np.asarray(istft_same(jnp.asarray(spec), n_fft, hop, win))
    got = np.asarray(istft_same_real(jnp.asarray(re), jnp.asarray(im), n_fft, hop, win))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_stft_istft_roundtrip():
    """A real signal survives STFT -> ISTFT (away from edges)."""
    n_fft, hop, win = 2048, 512, 2048
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, hop * 40)).astype(np.float32)
    window = jnp.asarray(hann_window(win))
    pad = (win - hop) // 2
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (pad, pad)), mode="reflect")
    from stabletts_tpu.ops.stft import frame_signal

    frames = frame_signal(xp, n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    y = np.asarray(istft_same(spec, n_fft, hop, win))
    assert y.shape == x.shape
    # interior matches well; edges affected by reflect-pad
    sl = slice(2 * hop, -2 * hop)
    np.testing.assert_allclose(y[:, sl], x[:, sl], rtol=1e-3, atol=1e-3)


def test_istft_fused_matches_xla_path():
    # fused Pallas kernel (interpret mode on CPU) vs the XLA istft_same_real
    from stabletts_tpu.ops.istft import istft_same_real
    from stabletts_tpu.ops.istft_pallas import istft_same_fused

    rng = np.random.default_rng(0)
    for t in (7, 16, 50):  # includes a non-multiple-of-8 frame count
        re = jnp.asarray(rng.standard_normal((2, t, 1025)), jnp.float32)
        im = jnp.asarray(rng.standard_normal((2, t, 1025)), jnp.float32)
        ref = istft_same_real(re, im, 2048, 512, 2048)
        got = istft_same_fused(re, im, 2048, 512, 2048, interpret=True)
        assert got.shape == ref.shape == (2, t * 512)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_istft_fused_diff_gradient_matches_xla():
    """The fused head's custom VJP (XLA linear transpose) must match the
    gradient of the pure XLA path — this is what makes GAN training safe when
    the fused ISTFT is selected (advisor finding: models/vocos.py env
    override used to trace-fail under jax.grad)."""
    import jax

    from stabletts_tpu.ops.istft import istft_same_real
    from stabletts_tpu.ops.istft_pallas import istft_same_fused_diff

    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal((2, 10, 1025)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, 10, 1025)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 10 * 512)), jnp.float32)

    loss_fused = lambda re, im: jnp.sum(
        w * istft_same_fused_diff(re, im, 2048, 512, 2048, None, True))
    loss_xla = lambda re, im: jnp.sum(w * istft_same_real(re, im, 2048, 512, 2048))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(re, im)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(re, im)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-5, atol=1e-5)


def test_istft_fused_rejects_bad_config():
    from stabletts_tpu.ops.istft_pallas import istft_same_fused

    re = jnp.zeros((1, 8, 9))
    with pytest.raises(ValueError):
        istft_same_fused(re, re, 16, 5, 16, interpret=True)
