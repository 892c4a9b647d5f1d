"""StableTTS top model: encoder + reference encoder + duration predictor +
flow-matching decoder, with MAS alignment and CFG training dropout
(reference: models/model.py:30-178)."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from stabletts_tpu.models.duration_predictor import DurationPredictor, duration_loss
from stabletts_tpu.models.flow_matching import CFMDecoder
from stabletts_tpu.models.reference_encoder import MelStyleEncoder
from stabletts_tpu.models.text_encoder import TextEncoder
from stabletts_tpu.ops.mas import maximum_path_auto
from stabletts_tpu.ops.mask import sequence_mask

_LOG_2PI = math.log(2 * math.pi)


def generate_path(duration: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """duration: [B, Tx] (possibly fractional after length_scale), mask:
    [B, Tx, Ty] -> hard monotonic alignment path [B, Tx, Ty]
    (reference: models/model.py:17-27)."""
    t_y = mask.shape[2]
    cum_duration = jnp.cumsum(duration, axis=1)  # [B, Tx]
    pos = jnp.arange(t_y, dtype=cum_duration.dtype)
    path = (pos[None, None, :] < cum_duration[:, :, None]).astype(mask.dtype)
    path = path - jnp.pad(path, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    return path * mask


class StableTTS(nn.Module):
    n_vocab: int
    mel_channels: int
    hidden_channels: int = 256
    filter_channels: int = 1024
    n_heads: int = 4
    n_enc_layers: int = 3
    n_dec_layers: int = 6
    kernel_size: int = 3
    p_dropout: float = 0.1
    gin_channels: int = 256
    cfg_dropout: float = 0.2
    remat: bool = False

    def setup(self):
        self.encoder = TextEncoder(
            self.n_vocab,
            self.mel_channels,
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_enc_layers,
            self.kernel_size,
            self.p_dropout,
            self.gin_channels,
        )
        self.ref_encoder = MelStyleEncoder(
            n_mel_channels=self.mel_channels,
            style_vector_dim=self.gin_channels,
            style_kernel_size=5,
            dropout=0.25,
        )
        self.dp = DurationPredictor(
            self.hidden_channels, self.filter_channels, self.kernel_size, 0.5, self.gin_channels
        )
        self.decoder = CFMDecoder(
            self.mel_channels,
            self.mel_channels,
            self.hidden_channels,
            self.mel_channels,
            self.filter_channels,
            self.n_heads,
            self.n_dec_layers,
            self.kernel_size,
            self.p_dropout,
            self.gin_channels,
            remat=self.remat,
        )
        # learned unconditional embeddings for CFG (model.py:43-46)
        self.fake_speaker = self.param("fake_speaker", nn.initializers.zeros, (1, self.gin_channels))
        self.fake_content = self.param("fake_content", nn.initializers.zeros, (1, self.mel_channels))

    def prepare_synthesis(
        self,
        x: jnp.ndarray,
        x_lengths: jnp.ndarray,
        y_ref: jnp.ndarray,
        max_mel_len: int,
        length_scale: float = 1.0,
        y_ref_mask: Optional[jnp.ndarray] = None,
        clip_len: Optional[int] = None,
    ) -> dict:
        """Encoder half of synthesise (reference: models/model.py:77-96).

        Text ids [B, Tx] + reference mel [B, Tref, n_mels] -> aligned encoder
        output mu_y [B, max_mel_len, n_mels], style vector c, masks. The static
        `max_mel_len` replaces the reference's data-dependent y_max_length
        (model.py:83-91) so everything jit-compiles with static shapes;
        y_lengths reports the true (clipped) lengths for host-side trimming.
        """
        # y_ref_mask=None matches the reference exactly (synthesise passes no
        # ref mask, model.py:79); provide one when batching refs of unequal
        # length so the masked mean-pool stays correct
        c = self.ref_encoder(y_ref, y_ref_mask, True)
        x, mu_x, x_mask = self.encoder(x, c, x_lengths, True)
        logw = self.dp(x, x_mask, c, True)  # [B, Tx, 1]

        # duration -> frame-position arithmetic stays f32 even under a bf16
        # compute dtype: above frame 512 bf16's ulp is 4, so a bf16 cumsum /
        # arange would collapse consecutive frame positions and silently drop
        # short phonemes past ~6 s of audio
        w = jnp.exp(logw.astype(jnp.float32)) * x_mask[..., None].astype(jnp.float32)
        w_ceil = jnp.ceil(w) * length_scale
        # clip_len < max_mel_len when the sampler pads the compute length to
        # an attention-block multiple: true lengths still honor the caller's
        # requested maximum
        raw_lengths = jnp.sum(w_ceil, axis=(1, 2))
        cap = clip_len or max_mel_len
        y_lengths = jnp.clip(raw_lengths, 1, cap).astype(jnp.int32)
        # explicit per-item "prediction exceeded the cap" flag: callers regrow
        # on this rather than inferring from y_lengths == cap, which would
        # false-positive (and recompile at 2x) when a prediction exactly fits
        y_clamped = raw_lengths > cap

        y_mask = sequence_mask(y_lengths, max_mel_len, dtype=x_mask.dtype)
        attn_mask = (
            x_mask[:, :, None] * y_mask[:, None, :]
        ).astype(jnp.float32)  # [B, Tx, Ty]
        attn = generate_path(w_ceil[..., 0], attn_mask)

        # path entries are exact 0/1 — safe to cast down for the MXU einsum
        mu_y = jnp.einsum("bxy,bxc->byc", attn.astype(mu_x.dtype), mu_x)
        return {
            "mu_y": mu_y,
            "c": c,
            "y_mask": y_mask,
            "y_lengths": y_lengths,
            "y_clamped": y_clamped,
            "attn": attn,
        }

    def velocity(self, t, xt, y_mask, mu, c, mu_is_precomputed: bool = False):
        """Conditional velocity field for the ODE sampler. t: [B]."""
        return self.decoder(t, xt, y_mask, mu, c, True, mu_is_precomputed)

    def precompute_mu(self, mu):
        """Hoist the t-independent estimator prenet out of the ODE loop."""
        return self.decoder.estimator.precompute_mu(mu)

    def precompute_fake_mu(self, b: int, t_len: int, valid_len: Optional[int] = None):
        """Prenet over the learned unconditional content embedding (CFG).

        valid_len < t_len when the sampler pads the compute length: frames
        beyond valid_len are zeroed so the (unmasked) prenet convs see the
        same boundary values as an unpadded run (torch SAME padding reads 0
        past the end, reference models/estimator.py:83-89).
        """
        fake_mu = jnp.broadcast_to(self.fake_content[:, None, :], (b, t_len, self.mel_channels))
        if valid_len is not None and valid_len < t_len:
            keep = (jnp.arange(t_len) < valid_len).astype(fake_mu.dtype)
            fake_mu = fake_mu * keep[None, :, None]
        return self.decoder.estimator.precompute_mu(fake_mu)

    def cfg_velocity(self, t, xt, y_mask, mu, c, cfg_strength, fake_mu=None, mu_is_precomputed: bool = False):
        """Classifier-free-guided velocity: uncond + s * (cond - uncond)
        (reference: models/flow_matching.py:58-67).

        The reference runs two sequential estimator passes per step; here the
        conditional and unconditional branches are BATCHED into one [2B]
        estimator call — identical numerics, one kernel schedule instead of
        two (measured ~1.25x faster CFG sampling on v5e at B=32)."""
        b, t_len = mu.shape[0], mu.shape[1]
        fake_c = jnp.broadcast_to(self.fake_speaker, (b, self.gin_channels))
        if fake_mu is None:
            if mu_is_precomputed:
                # the raw fake_content embedding must go through the estimator
                # prenet like the reference's cfg_wrapper does — feeding it as
                # if it were prenet output silently corrupts the uncond branch
                raise ValueError(
                    "cfg_velocity: mu is precomputed but fake_mu is None; pass "
                    "precompute_fake_mu(...) output for the unconditional branch"
                )
            fake_mu = jnp.broadcast_to(self.fake_content[:, None, :], (b, t_len, self.mel_channels))
        cat = lambda a, b_: jnp.concatenate([a, b_], axis=0)
        out = self.decoder(
            cat(t, t), cat(xt, xt), cat(y_mask, y_mask),
            jax.tree_util.tree_map(cat, mu, fake_mu),
            cat(c, fake_c), True, mu_is_precomputed,
        )
        cond, uncond = out[:b], out[b:]
        return uncond + cfg_strength * (cond - uncond)

    def __call__(self, x, x_lengths, y, y_lengths, z, z_lengths, deterministic: bool = False):
        """Training forward: returns (dur_loss, diff_loss, prior_loss, attn)
        (reference: models/model.py:114-178).

        x: [B, Tx] ids; y: [B, Ty, n_mels] target mel; z: [B, Tz, n_mels]
        sliced reference mel. Uses rng streams 'cfg', 'time', 'noise' (and
        linen's 'dropout' when not deterministic).
        """
        b = y.shape[0]
        y_mask = sequence_mask(y_lengths, y.shape[1], dtype=y.dtype)
        z_mask = sequence_mask(z_lengths, z.shape[1], dtype=z.dtype)

        if deterministic:
            cfg_mask = jnp.ones((b, 1), dtype=y.dtype)
        else:
            cfg_mask = (
                jax.random.uniform(self.make_rng("cfg"), (b, 1)) > self.cfg_dropout
            ).astype(y.dtype)

        c = self.ref_encoder(z, z_mask, deterministic)
        c = c * cfg_mask + (1 - cfg_mask) * self.fake_speaker

        x, mu_x, x_mask = self.encoder(x, c, x_lengths, deterministic)
        logw = self.dp(x, x_mask, c, deterministic)  # [B, Tx, 1]

        # MAS target (no gradient): Gaussian log-likelihood of each (mel, text)
        # pair with unit variance (model.py:149-158)
        neg_cent = (
            -0.5 * _LOG_2PI * self.mel_channels
            - 0.5 * jnp.sum(y ** 2, axis=-1, keepdims=True)  # [B, Ty, 1]
            + jnp.einsum("byd,bxd->byx", y, mu_x)
            - 0.5 * jnp.sum(mu_x ** 2, axis=-1)[:, None, :]  # [B, 1, Tx]
        )
        attn_mask_yx = y_mask[:, :, None] * x_mask[:, None, :]  # [B, Ty, Tx]
        attn = jax.lax.stop_gradient(
            maximum_path_auto(jax.lax.stop_gradient(neg_cent), attn_mask_yx)
        )
        attn = attn.astype(y.dtype)

        logw_ = jnp.log(1e-8 + jnp.sum(attn, axis=1))[..., None] * x_mask[..., None]
        dur = duration_loss(logw, logw_, x_lengths)

        mu_y = jnp.einsum("byx,bxd->byd", attn, mu_x)  # [B, Ty, n_mels]

        cfg_mask3 = cfg_mask[..., None]
        mu_y_masked = mu_y * cfg_mask3 + (1 - cfg_mask3) * self.fake_content[:, None, :]

        t_rand = jax.random.uniform(self.make_rng("time"), (b,), dtype=y.dtype)
        noise = jax.random.normal(self.make_rng("noise"), y.shape, dtype=y.dtype)
        diff, _ = self.decoder.compute_loss(
            y, y_mask, mu_y_masked, c, t_rand, noise, deterministic
        )

        resid = (y - mu_y).astype(jnp.float32)
        prior = jnp.sum(0.5 * (resid ** 2 + _LOG_2PI) * y_mask[..., None].astype(jnp.float32))
        prior = prior / (jnp.sum(y_mask.astype(jnp.float32)) * self.mel_channels)

        return dur, diff, prior, attn
