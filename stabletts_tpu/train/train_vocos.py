"""Vocos GAN training: D-step then G-step in one jitted XLA computation,
data-parallel over the mesh (reference: vocoders/vocos/train.py:43-165).

Efficiency notes vs a naive port:
  * the generator forward runs ONCE per step via jax.vjp — its output feeds
    the D step (stop-gradient) and its pullback carries the G-step cotangent,
    matching the reference's single forward + backward
  * mel extraction (input mel + 7-scale mel losses) happens on-device inside
    the same jit, not on the host dataloader
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stabletts_tpu.config import MelConfig, VocosConfig, VocosTrainConfig
from stabletts_tpu.models.discriminators import (
    MultiPeriodDiscriminator,
    MultiResolutionDiscriminator,
    fold_weightnorm,
)
from stabletts_tpu.models.gan_losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    multi_scale_mel_configs,
    multi_scale_mel_loss,
)
from stabletts_tpu.models.vocos import Vocos
from stabletts_tpu.ops.stft import log_mel_spectrogram
from stabletts_tpu.parallel import mesh as mesh_lib
from stabletts_tpu.train.scheduler import cosine_with_warmup


@dataclass
class VocosTrainState:
    step: int
    params_g: Any
    params_mpd: Any
    params_mrd: Any
    opt_g: Any
    opt_d: Any

    def replace(self, **kw):
        d = dict(
            step=self.step, params_g=self.params_g, params_mpd=self.params_mpd,
            params_mrd=self.params_mrd, opt_g=self.opt_g, opt_d=self.opt_d,
        )
        d.update(kw)
        return VocosTrainState(**d)


jax.tree_util.register_pytree_node(
    VocosTrainState,
    lambda s: ((s.step, s.params_g, s.params_mpd, s.params_mrd, s.opt_g, s.opt_d), None),
    lambda _, c: VocosTrainState(*c),
)


def make_gan_optimizer(
    cfg: VocosTrainConfig, total_steps: int, clip: bool = True
) -> optax.GradientTransformation:
    """AdamW + cosine-warmup + grad clip (reference: train.py:73-77, 108-109).

    weight_decay=0.01 matches torch.optim.AdamW's default, which the
    reference uses implicitly (optax's default would be 1e-4 — 100x weaker).
    clip=False omits the global-norm clip for callers that clip per-subtree
    (the reference clips MPD and MRD separately, train.py:108-109).
    """
    tx = optax.adamw(
        cosine_with_warmup(cfg.learning_rate, cfg.warmup_steps, total_steps),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
    )
    if clip:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def _clip_by_norm(grads, max_norm: float):
    """optax.clip_by_global_norm's scaling applied to one subtree."""
    norm = optax.global_norm(grads)
    scale = max_norm / jnp.maximum(norm, max_norm)  # min(1, max_norm/norm)
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def make_vocos_train_step(
    gen: Vocos,
    mpd: MultiPeriodDiscriminator,
    mrd: MultiResolutionDiscriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    mel_cfg: MelConfig,
    mel_loss_coeff: float,
    grad_clip: float = 1000.0,
    compute_dtype=None,
) -> Callable:
    """compute_dtype=jnp.bfloat16 runs the generator and both discriminators
    (forward AND backward) in bf16 against f32 master params; the mel-loss
    STFT stack, loss reductions, grads, and the optimizer stay f32. The
    reference trains pure fp32 (no AMP anywhere), so f32 is the default."""
    ms_cfgs = multi_scale_mel_configs(mel_cfg)
    # plain-conv twins of the discriminators: the step folds weight-norm into
    # the kernels ONCE per loss evaluation (see fold_weightnorm) instead of
    # letting nn.WeightNorm re-normalize every kernel in all 4 applications
    mpd_p = mpd.clone(use_weight_norm=False)
    mrd_p = mrd.clone(use_weight_norm=False)

    def _cast(tree):
        if compute_dtype is None:
            return tree
        from stabletts_tpu.models.sampler import cast_tree

        return cast_tree(tree, compute_dtype)

    def step_fn(state: VocosTrainState, audio: jnp.ndarray):
        """audio: [B, segment_size]. D step first, then G step, like the
        reference's optimizer ordering (train.py:95-132)."""
        mels = log_mel_spectrogram(audio, mel_cfg)
        audio_c = audio if compute_dtype is None else audio.astype(compute_dtype)
        mels_c = mels if compute_dtype is None else mels.astype(compute_dtype)

        fake, gen_vjp = jax.vjp(
            lambda pg: gen.apply({"params": _cast(pg)}, mels_c), state.params_g
        )
        fake_sg = jax.lax.stop_gradient(fake)

        # ---- discriminator step ----
        def d_loss_fn(pd):
            pdc = _cast(pd)
            pdf = {k: fold_weightnorm(v) for k, v in pdc.items()}
            rf, gf, _, _ = mpd_p.apply({"params": pdf["mpd"]}, audio_c, fake_sg)
            loss_f, _, _ = discriminator_loss(rf, gf)
            rs, gs, _, _ = mrd_p.apply({"params": pdf["mrd"]}, audio_c, fake_sg)
            loss_s, _, _ = discriminator_loss(rs, gs)
            return loss_f + loss_s, (loss_f, loss_s)

        pd = {"mpd": state.params_mpd, "mrd": state.params_mrd}
        (loss_d, (loss_disc_f, loss_disc_s)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(pd)
        grad_norm_mpd = optax.global_norm(grads_d["mpd"])
        grad_norm_mrd = optax.global_norm(grads_d["mrd"])
        # the reference clips MPD and MRD norms SEPARATELY at grad_clip
        # (train.py:108-109); a single clip over the combined tree would
        # rescale both whenever their joint norm crosses the bound
        grads_d = {
            "mpd": _clip_by_norm(grads_d["mpd"], grad_clip),
            "mrd": _clip_by_norm(grads_d["mrd"], grad_clip),
        }
        upd_d, opt_d = tx_d.update(grads_d, state.opt_d, pd)
        pd = optax.apply_updates(pd, upd_d)

        # ---- generator step (against the updated discriminators) ----
        # fold OUTSIDE g_loss_fn: the G step differentiates w.r.t. the fake
        # audio only, so the folded kernels are constants there (no
        # weight-norm backward at all in the G step)
        pd_c = {k: fold_weightnorm(v) for k, v in _cast(pd).items()}

        def g_loss_fn(fake_in):
            # mel L1 in f32 regardless of compute dtype (log of a clamp at
            # 1e-5 underflows bf16's 8-bit mantissa)
            loss_mel = multi_scale_mel_loss(
                audio, fake_in.astype(jnp.float32), ms_cfgs
            ) * mel_loss_coeff
            rf, gf, fr, fg = mpd_p.apply({"params": pd_c["mpd"]}, audio_c, fake_in)
            loss_fm_f = feature_loss(fr, fg)
            loss_gen_f, _ = generator_loss(gf)
            rs, gs, sr_, sg_ = mrd_p.apply({"params": pd_c["mrd"]}, audio_c, fake_in)
            loss_fm_s = feature_loss(sr_, sg_)
            loss_gen_s, _ = generator_loss(gs)
            total = loss_gen_s + loss_gen_f + loss_fm_s + loss_fm_f + loss_mel
            return total, dict(
                mel_loss=loss_mel, fm_loss_mpd=loss_fm_f, gen_loss_mpd=loss_gen_f,
                fm_loss_mrd=loss_fm_s, gen_loss_mrd=loss_gen_s,
            )

        (loss_g, aux), dfake = jax.value_and_grad(g_loss_fn, has_aux=True)(fake)
        (grads_g,) = gen_vjp(dfake.astype(fake.dtype))
        grad_norm_g = optax.global_norm(grads_g)
        upd_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, upd_g)

        metrics = dict(
            gen_loss_total=loss_g,
            disc_loss_mpd=loss_disc_f,
            disc_loss_mrd=loss_disc_s,
            grad_norm_g=grad_norm_g,
            grad_norm_mpd=grad_norm_mpd,
            grad_norm_mrd=grad_norm_mrd,
            **aux,
        )
        new_state = state.replace(
            step=state.step + 1, params_g=params_g,
            params_mpd=pd["mpd"], params_mrd=pd["mrd"],
            opt_g=opt_g, opt_d=opt_d,
        )
        return new_state, metrics

    return step_fn


def init_vocos_training(
    vocos_cfg: VocosConfig,
    mel_cfg: MelConfig,
    train_cfg: VocosTrainConfig,
    total_steps: int,
    seed: int = 0,
):
    """Builds modules, params, optimizers, and the jitted step function."""
    gen = Vocos(vocos_cfg, mel_cfg)
    mpd = MultiPeriodDiscriminator()
    mrd = MultiResolutionDiscriminator()

    rng = jax.random.PRNGKey(seed)
    r1, r2, r3 = jax.random.split(rng, 3)
    seg_frames = max(train_cfg.segment_size // mel_cfg.hop_length, 8)
    dummy_mel = jnp.zeros((1, seg_frames, mel_cfg.n_mels))
    dummy_audio = jnp.zeros((1, train_cfg.segment_size))
    params_g = gen.init(r1, dummy_mel)["params"]
    params_mpd = mpd.init(r2, dummy_audio, dummy_audio)["params"]
    params_mrd = mrd.init(r3, dummy_audio, dummy_audio)["params"]

    tx_g = make_gan_optimizer(train_cfg, total_steps)
    # D grads are clipped per-subtree inside the step (reference clips MPD and
    # MRD separately), so the D optimizer carries no combined-tree clip
    tx_d = make_gan_optimizer(train_cfg, total_steps, clip=False)
    state = VocosTrainState(
        step=0,
        params_g=params_g, params_mpd=params_mpd, params_mrd=params_mrd,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init({"mpd": params_mpd, "mrd": params_mrd}),
    )
    compute_dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else None
    step_fn = jax.jit(
        make_vocos_train_step(
            gen, mpd, mrd, tx_g, tx_d, mel_cfg, train_cfg.mel_loss_coeff,
            grad_clip=train_cfg.grad_clip, compute_dtype=compute_dtype,
        ),
        donate_argnums=(0,),
    )
    return gen, mpd, mrd, state, step_fn


def train_vocos(
    train_cfg: Optional[VocosTrainConfig] = None,
    vocos_cfg: Optional[VocosConfig] = None,
    mel_cfg: Optional[MelConfig] = None,
    num_epochs: Optional[int] = None,
    log_fn: Callable[[int, dict], None] = None,
):
    """Full GAN training entry point (reference: vocoders/vocos/train.py:43-165)."""
    from stabletts_tpu.data.vocos_dataset import VocosDataset
    from stabletts_tpu.train.state import save_checkpoint_named, continue_training_vocos

    train_cfg = train_cfg or VocosTrainConfig()
    vocos_cfg = vocos_cfg or VocosConfig()
    mel_cfg = mel_cfg or MelConfig()
    if vocos_cfg.input_channels != mel_cfg.n_mels:
        raise ValueError("input_channels and n_mels must be equal.")

    mesh = mesh_lib.make_mesh()
    n_proc = jax.process_count()
    rank = jax.process_index()

    dataset = VocosDataset(train_cfg.train_dataset_path, train_cfg.segment_size, mel_cfg.sample_rate)
    n_epochs = num_epochs or train_cfg.num_epochs
    per_rank = len(dataset) // n_proc
    # identical on every rank — each rank's order slice has >= per_rank
    # elements, so every rank executes exactly this many (global, collective)
    # steps; a per-rank count would deadlock multi-host runs
    steps_per_epoch = per_rank // train_cfg.batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset ({len(dataset)} clips) is smaller than one global batch "
            f"({n_proc} hosts x batch_size {train_cfg.batch_size})"
        )
    total_steps = n_epochs * steps_per_epoch

    gen, mpd, mrd, state, step_fn = init_vocos_training(
        vocos_cfg, mel_cfg, train_cfg, total_steps, train_cfg.seed
    )
    start_epoch, state = continue_training_vocos(train_cfg.model_save_path, state)
    # align the step counter with the resumed epoch (metrics/step-keyed logic)
    state = state.replace(step=start_epoch * steps_per_epoch)
    state = mesh_lib.replicate(mesh, state)

    from stabletts_tpu.data.prefetch import prefetch

    for epoch in range(start_epoch, n_epochs):
        order = np.random.default_rng(epoch).permutation(len(dataset))
        order = order[rank::n_proc]
        t0 = time.time()
        metrics = {}

        def make_device_batch(b):
            # loader threads overlap wav decode + crop + H2D with the device
            # step; crop offsets are seeded per (seed, epoch, rank, batch) so
            # results don't depend on worker scheduling
            idx = order[b * train_cfg.batch_size : (b + 1) * train_cfg.batch_size]
            rng = np.random.default_rng(
                np.random.SeedSequence([train_cfg.seed, epoch, rank, b])
            )
            return mesh_lib.shard_batch(mesh, dataset.batch(idx, rng))

        # always full batches: steps_per_epoch * batch_size <= per_rank
        steps = range(steps_per_epoch)
        if train_cfg.loader_workers > 0:
            batches = prefetch(
                steps, make_device_batch,
                n_workers=train_cfg.loader_workers, depth=train_cfg.prefetch_depth,
            )
        else:
            batches = map(make_device_batch, steps)
        for b, audio_dev in enumerate(batches):
            state, metrics = step_fn(state, audio_dev)
            if rank == 0 and log_fn is not None and b % train_cfg.log_interval == 0:
                log_fn(epoch * steps_per_epoch + b, jax.device_get(metrics))
        if epoch % train_cfg.save_interval == 0:
            # ALL ranks call save: orbax's save barriers across processes
            # (rank-0 gating would deadlock multi-host); orbax no-ops the
            # writes on non-primary hosts
            host_state = jax.device_get(state)
            save_checkpoint_named(train_cfg.model_save_path, epoch, {
                "generator": host_state.params_g,
                "mpd": host_state.params_mpd,
                "mrd": host_state.params_mrd,
                "optimizerg": host_state.opt_g,
                "optimizerd": host_state.opt_d,
            })
        if metrics:
            print(
                f"rank {rank} epoch {epoch} gen_loss "
                f"{float(jax.device_get(metrics['gen_loss_total'])):.4f} ({time.time()-t0:.1f}s)"
            )
    return state
