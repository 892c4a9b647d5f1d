"""FireflyGAN parity: flax vs reference torch (random seeded weights through
the weight-norm-folding converter)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)

from stabletts_tpu.models.ffgan import FireflyGANBase
from stabletts_tpu.ops.conv import conv_transpose_1d
from stabletts_tpu.utils.convert import torch_state_dict_to_numpy, torch_to_flax_ffgan


def test_conv_transpose_matches_torch():
    torch.manual_seed(0)
    ct = torch.nn.ConvTranspose1d(6, 4, 16, stride=8, padding=4)
    ct.eval()
    x = torch.randn(2, 6, 20)
    with torch.no_grad():
        ref = ct(x).numpy()  # [B, C_out, T*8]
    kernel = jnp.asarray(ct.weight.detach().numpy().transpose(2, 0, 1))  # [k, in, out]
    bias = jnp.asarray(ct.bias.detach().numpy())
    got = np.asarray(conv_transpose_1d(jnp.asarray(x.numpy().transpose(0, 2, 1)), kernel, 8, 4, bias))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def pair():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from vocoders.ffgan.model import FireflyGANBase as RefFFGAN

    torch.manual_seed(2)
    ref = RefFFGAN()
    ref.eval()
    params = torch_to_flax_ffgan(torch_state_dict_to_numpy(ref.state_dict()))
    return ref, FireflyGANBase(), {"params": params}


def test_ffgan_backbone_parity(pair):
    ref, model, variables = pair
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 24, 128)).astype(np.float32)
    with torch.no_grad():
        ref_h = ref.backbone(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()  # [B, C, T]
    from stabletts_tpu.models.ffgan import ConvNeXtEncoder, FFGAN_CONFIG

    enc = ConvNeXtEncoder(**FFGAN_CONFIG["backbone"])
    got = np.asarray(enc.apply({"params": variables["params"]["backbone"]}, jnp.asarray(mel)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref_h, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_ffgan_full_parity(pair):
    ref, model, variables = pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 16, 128)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    got_wav = np.asarray(model.apply(variables, jnp.asarray(mel)))
    assert got_wav.shape == ref_wav.shape == (2, 16 * 512)
    np.testing.assert_allclose(got_wav, ref_wav, rtol=2e-3, atol=2e-3)


def test_conv1d_same_dots_matches_lax_conv():
    # documented alternative formulation (ops/conv.py) — not wired into any
    # model path, but must stay numerically equivalent to lax.conv SAME
    import jax

    from stabletts_tpu.ops.conv import conv1d_same_dots

    rng = np.random.default_rng(0)
    for k in (1, 2, 3, 4, 5):
        x = jnp.asarray(rng.standard_normal((2, 17, 8)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, 8, 12)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((12,)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC")
        ) + b
        np.testing.assert_allclose(conv1d_same_dots(x, w, b), ref, atol=1e-5)
