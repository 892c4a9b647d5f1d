"""Training-forward parity: the three losses (dur/diff/prior) match the
reference PyTorch model bit-close when all randomness is pinned.

The reference samples cfg-mask/t/noise internally (models/model.py:134-141,
flow_matching.py:90-96); torch.rand/randn are monkeypatched to fixed numpy
draws, and the same draws are injected into this framework's deterministic
loss path (cfg dropout off via deterministic=True + matching t/noise args).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)

from stabletts_tpu.models import build_stabletts
from stabletts_tpu.models.stabletts import StableTTS
from stabletts_tpu.utils.convert import torch_state_dict_to_numpy, torch_to_flax_stabletts

N_VOCAB, MEL = 401, 128


@pytest.mark.slow
def test_training_losses_match_reference():
    from ref_loader import load_reference

    ref = load_reference()
    torch.manual_seed(0)
    ref_tts = ref.model.StableTTS(
        N_VOCAB, MEL, hidden_channels=256, filter_channels=1024, n_heads=4,
        n_enc_layers=3, n_dec_layers=6, kernel_size=3, p_dropout=0.1, gin_channels=256,
    )
    ref_tts.eval()  # dropout off on both sides
    # adaLN-Zero zero-inits every DiT block to the identity — randomize the
    # modulation so the loss parity exercises the estimator interior
    with torch.no_grad():
        gen = torch.Generator().manual_seed(7)
        for name, p in ref_tts.named_parameters():
            if "adaLN_modulation" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)

    params = torch_to_flax_stabletts(torch_state_dict_to_numpy(ref_tts.state_dict()))
    model = build_stabletts()

    rng = np.random.default_rng(0)
    b, tx, ty, tz = 2, 24, 80, 30
    x = rng.integers(1, N_VOCAB, size=(b, tx)).astype(np.int64)
    x_lengths = np.asarray([tx, tx - 6], dtype=np.int64)
    x[1, tx - 6:] = 0
    y = rng.standard_normal((b, ty, MEL)).astype(np.float32)
    y_lengths = np.asarray([ty, ty - 12], dtype=np.int64)
    y[1, ty - 12:] = 0
    z = rng.standard_normal((b, tz, MEL)).astype(np.float32)
    z_lengths = np.asarray([tz, tz - 8], dtype=np.int64)
    z[1, tz - 8:] = 0

    t_draw = rng.uniform(size=(b, 1, 1)).astype(np.float32)
    noise_draw = rng.standard_normal((b, MEL, ty)).astype(np.float32)
    cfg_draw = np.ones((b, 1), dtype=np.float32)  # rand > 0.2 -> all True (cfg off)

    orig_rand, orig_randn_like = torch.rand, torch.randn_like

    def fake_rand(*shape, **kw):
        if tuple(shape) == (b, 1):
            return torch.from_numpy(cfg_draw * 0.9)  # > cfg_dropout -> mask True
        if tuple(shape) == (b, 1, 1) or (shape and isinstance(shape[0], list)):
            return torch.from_numpy(t_draw)
        return orig_rand(*shape, **kw)

    def fake_randn_like(t_in):
        return torch.from_numpy(noise_draw.copy())

    torch.rand = fake_rand
    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            ref_dur, ref_diff, ref_prior, ref_attn = ref_tts(
                torch.from_numpy(x), torch.from_numpy(x_lengths),
                torch.from_numpy(y.transpose(0, 2, 1)), torch.from_numpy(y_lengths),
                torch.from_numpy(z.transpose(0, 2, 1)), torch.from_numpy(z_lengths),
            )
    finally:
        torch.rand = orig_rand
        torch.randn_like = orig_randn_like

    # this framework: deterministic=True skips cfg dropout (mask all-ones),
    # and t/noise enter compute_loss through rng streams — instead call the
    # pieces directly for exact control
    variables = {"params": params}

    def losses(params_vars):
        from stabletts_tpu.models.duration_predictor import duration_loss
        from stabletts_tpu.ops.mas import maximum_path
        from stabletts_tpu.ops.mask import sequence_mask
        import math

        xl = jnp.asarray(x_lengths, jnp.int32)
        yl = jnp.asarray(y_lengths, jnp.int32)
        zl = jnp.asarray(z_lengths, jnp.int32)
        yj = jnp.asarray(y)
        zj = jnp.asarray(z)
        y_mask = sequence_mask(yl, ty)
        z_mask = sequence_mask(zl, tz)

        def fwd(m):
            c = m.ref_encoder(zj, z_mask, True)
            hx, mu_x, x_mask = m.encoder(jnp.asarray(x, jnp.int32), c, xl, True)
            logw = m.dp(hx, x_mask, c, True)
            neg_cent = (
                -0.5 * math.log(2 * math.pi) * MEL
                - 0.5 * jnp.sum(yj ** 2, axis=-1, keepdims=True)
                + jnp.einsum("byd,bxd->byx", yj, mu_x)
                - 0.5 * jnp.sum(mu_x ** 2, axis=-1)[:, None, :]
            )
            attn_mask = y_mask[:, :, None] * x_mask[:, None, :]
            attn = maximum_path(neg_cent, attn_mask)
            logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=1))[..., None] * x_mask[..., None]
            dur = duration_loss(logw, logw_, xl)
            mu_y = jnp.einsum("byx,bxd->byd", attn, mu_x)
            t_rand = jnp.asarray(t_draw[:, 0, 0])
            noise_j = jnp.asarray(noise_draw.transpose(0, 2, 1))
            diff, _ = m.decoder.compute_loss(yj, y_mask, mu_y, c, t_rand, noise_j, True)
            resid = yj - mu_y
            prior = jnp.sum(0.5 * (resid ** 2 + math.log(2 * math.pi)) * y_mask[..., None])
            prior = prior / (jnp.sum(y_mask) * MEL)
            return dur, diff, prior, attn

        return nn_apply(fwd, params_vars)

    import flax.linen as nn_linen

    def nn_apply(fn, vars_):
        return model.apply(vars_, method=lambda m: fn(m))

    got_dur, got_diff, got_prior, got_attn = losses(variables)

    # the cosine-warped t differs between frameworks only by fp rounding
    np.testing.assert_allclose(float(got_dur), float(ref_dur), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(got_diff), float(ref_diff), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(got_prior), float(ref_prior), rtol=2e-3, atol=1e-4)
    # alignment identical (reference returns attn transposed [b, tx, ty])
    np.testing.assert_array_equal(
        np.asarray(got_attn).transpose(0, 2, 1), ref_attn.numpy()
    )
