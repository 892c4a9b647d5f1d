"""Numerical parity: Vocos vocoder vs the reference PyTorch implementation
(mel [B, T, n_mels] -> waveform), through the checkpoint converter."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)

from stabletts_tpu.config import MelConfig, VocosConfig
from stabletts_tpu.models.vocos import Vocos
from stabletts_tpu.utils.convert import torch_state_dict_to_numpy, torch_to_flax_vocos


@pytest.fixture(scope="module")
def pair():
    from ref_loader import load_reference_vocos

    ref_mod = load_reference_vocos()
    import config as ref_config

    torch.manual_seed(1)
    ref_vocos = ref_mod.Vocos(ref_config.VocosConfig(), ref_config.MelConfig())
    ref_vocos.eval()
    params = torch_to_flax_vocos(torch_state_dict_to_numpy(ref_vocos.state_dict()))
    model = Vocos(VocosConfig(), MelConfig())
    return ref_vocos, model, {"params": params}


def test_vocos_waveform_parity(pair):
    ref_vocos, model, variables = pair
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 37, 128)).astype(np.float32)
    with torch.no_grad():
        ref_wav = ref_vocos(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()
    got_wav = np.asarray(model.apply(variables, jnp.asarray(mel)))
    assert got_wav.shape == ref_wav.shape == (2, 37 * 512)
    np.testing.assert_allclose(got_wav, ref_wav, rtol=1e-3, atol=1e-4)


def test_vocos_backbone_parity(pair):
    ref_vocos, model, variables = pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 50, 128)).astype(np.float32)
    with torch.no_grad():
        ref_h = ref_vocos.backbone(torch.from_numpy(mel.transpose(0, 2, 1))).numpy()  # [B, T, C]
    from stabletts_tpu.models.vocos import VocosBackbone

    backbone = VocosBackbone(input_channels=128, dim=512, intermediate_dim=1536, num_layers=8)
    got_h = np.asarray(
        backbone.apply({"params": variables["params"]["backbone"]}, jnp.asarray(mel))
    )
    np.testing.assert_allclose(got_h, ref_h, rtol=2e-4, atol=2e-4)


def test_vocos_export_roundtrip(pair):
    """torch -> flax -> torch round trip for Vocos: bit-exact tensors, full
    coverage minus the constant ISTFT window buffer."""
    from stabletts_tpu.utils.convert import flax_to_torch_vocos

    ref_vocos, _, variables = pair
    sd0 = {k: v.detach().cpu().numpy() for k, v in ref_vocos.state_dict().items()}
    sd1 = flax_to_torch_vocos(variables["params"])

    buffers = {k for k in sd0 if "window" in k}
    assert set(sd1) == set(sd0) - buffers
    for k, v in sd1.items():
        np.testing.assert_array_equal(v, sd0[k], err_msg=k)
