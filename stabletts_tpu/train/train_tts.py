"""TTS training: jit-compiled train step, data-parallel over the device mesh.

Replaces the reference's DDP loop (reference: train.py:39-96). The whole step
— forward (incl. on-device MAS), backward, AdamW update — is one XLA
computation; with the batch sharded over the 'data' mesh axis and params
replicated, XLA inserts the gradient all-reduce over ICI/DCN automatically.
Loss = dur + diff + prior, summed unweighted (train.py:78-79).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stabletts_tpu.config import MelConfig, ModelConfig, TrainConfig
from stabletts_tpu.models import build_stabletts, init_stabletts_params
from stabletts_tpu.models.stabletts import StableTTS
from stabletts_tpu.parallel import mesh as mesh_lib
from stabletts_tpu.train.scheduler import cosine_with_warmup
from stabletts_tpu.train.state import TrainState, continue_training, save_checkpoint


def make_optimizer(cfg: TrainConfig, total_steps: int) -> optax.GradientTransformation:
    """AdamW with cosine-warmup schedule (reference: train.py:60-61)."""
    return optax.adamw(
        cosine_with_warmup(cfg.learning_rate, cfg.warmup_steps, total_steps),
        b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
    )


def make_train_step(
    model: StableTTS,
    tx: optax.GradientTransformation,
    compute_dtype=None,
) -> Callable:
    """Returns train_step(state, batch, base_rng) -> (state, metrics).

    With compute_dtype=jnp.bfloat16, the forward/backward run in bf16 against
    f32 master params (loss reductions stay f32); grads and the optimizer are
    f32. The reference trains pure fp32 (train.py has no AMP), so fp32 is the
    default here too.
    """

    def train_step(state: TrainState, batch, base_rng):
        x, x_lengths, y, y_lengths, z, z_lengths = batch
        step_rng = jax.random.fold_in(base_rng, state.step)
        cfg_rng, time_rng, noise_rng, drop_rng = jax.random.split(step_rng, 4)

        def loss_fn(params):
            if compute_dtype is not None:
                from stabletts_tpu.models.sampler import cast_tree

                params = cast_tree(params, compute_dtype)
                yy, zz = y.astype(compute_dtype), z.astype(compute_dtype)
            else:
                # widen on-device: a no-op for f32 batches, and the landing
                # point for float16-shipped mels (TrainConfig.transfer_dtype)
                yy, zz = y.astype(jnp.float32), z.astype(jnp.float32)
            dur, diff, prior, _ = model.apply(
                {"params": params},
                x, x_lengths, yy, y_lengths, zz, z_lengths, False,
                rngs={"cfg": cfg_rng, "time": time_rng, "noise": noise_rng, "dropout": drop_rng},
            )
            return dur + diff + prior, (dur, diff, prior)

        (loss, (dur, diff, prior)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "dur_loss": dur,
            "diff_loss": diff,
            "prior_loss": prior,
            "grad_norm": optax.global_norm(grads),
        }
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step


def train(
    train_cfg: Optional[TrainConfig] = None,
    model_cfg: Optional[ModelConfig] = None,
    mel_cfg: Optional[MelConfig] = None,
    log_fn: Callable[[int, dict], None] = None,
):
    """Full training entry point (reference: train.py:39-96).

    Runs SPMD: call once per host under `jax.distributed`; the mesh spans all
    chips globally; each host feeds its rank-strided shard of every batch.
    """
    from stabletts_tpu.data.dataset import StableDataset, collate
    from stabletts_tpu.data.prefetch import prefetch
    from stabletts_tpu.data.sampler import DistributedBucketSampler

    train_cfg = train_cfg or TrainConfig()
    model_cfg = model_cfg or ModelConfig()
    mel_cfg = mel_cfg or MelConfig()

    mesh = mesh_lib.make_mesh()
    n_proc = jax.process_count()
    rank = jax.process_index()
    assert train_cfg.batch_size % jax.local_device_count() == 0, (
        f"batch_size {train_cfg.batch_size} must be divisible by the "
        f"local device count {jax.local_device_count()}"
    )

    dataset = StableDataset(train_cfg.train_dataset_path)
    sampler = DistributedBucketSampler(
        dataset.lengths, train_cfg.batch_size, list(train_cfg.bucket_boundaries),
        num_replicas=n_proc, rank=rank,
    )
    steps_per_epoch = len(sampler)
    total_steps = train_cfg.num_epochs * max(steps_per_epoch, 1)

    model = build_stabletts(model_cfg, mel_cfg)
    variables = init_stabletts_params(model, jax.random.PRNGKey(train_cfg.seed))
    tx = make_optimizer(train_cfg, total_steps)
    params = variables["params"]
    opt_state = tx.init(params)

    start_epoch, params, opt_state = continue_training(
        train_cfg.model_save_path, params, opt_state
    )
    state = TrainState(step=start_epoch * steps_per_epoch, params=params, opt_state=opt_state)
    state = mesh_lib.replicate(mesh, state)

    compute_dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else None
    train_step = jax.jit(make_train_step(model, tx, compute_dtype), donate_argnums=(0,))
    base_rng = jax.random.PRNGKey(train_cfg.seed + 1)

    for epoch in range(start_epoch, train_cfg.num_epochs):
        sampler.set_epoch(epoch)
        t_start = time.time()
        metrics = {}

        def make_device_batch(work):
            # runs on loader threads: disk reads + padding + H2D transfer all
            # overlap the device step. The z-slice PRNG is derived per
            # (seed, epoch, item) inside collate, so batches are identical
            # regardless of worker count, prefetch depth, resume point, or
            # process count (1-host and N-host runs see the same global batch).
            batch_idx, (bucket, indices) = work
            batch = collate(
                dataset, indices, sampler.bucket_mel_len(bucket),
                train_cfg.max_text_len, mel_cfg.n_mels, (train_cfg.seed, epoch),
            )
            tup = batch.as_tuple()
            if train_cfg.transfer_dtype == "float16":
                # halve H2D bytes; widened back at step entry (see
                # make_train_step). Quantizes mel inputs to f16.
                tup = tuple(
                    a.astype(np.float16) if a.dtype == np.float32 else a
                    for a in tup
                )
            return mesh_lib.shard_batch(mesh, tup)

        if train_cfg.loader_workers > 0:
            batches = prefetch(
                enumerate(sampler), make_device_batch,
                n_workers=train_cfg.loader_workers, depth=train_cfg.prefetch_depth,
            )
        else:
            batches = map(make_device_batch, enumerate(sampler))
        for batch_idx, device_batch in enumerate(batches):
            state, metrics = train_step(state, device_batch, base_rng)
            if rank == 0 and log_fn is not None and batch_idx % train_cfg.log_interval == 0:
                log_fn(epoch * steps_per_epoch + batch_idx, jax.device_get(metrics))

        if epoch % train_cfg.save_interval == 0:
            # ALL ranks call save: orbax's save is a collective (it barriers in
            # multihost.sync_global_processes); gating on rank 0 would deadlock
            # multi-host runs. Orbax itself makes non-primary hosts no-op the
            # actual writes.
            save_checkpoint(
                train_cfg.model_save_path, epoch, jax.device_get(state.params),
                jax.device_get(state.opt_state),
            )
        if metrics:
            print(
                f"rank {rank} epoch {epoch} loss {float(jax.device_get(metrics['loss'])):.4f} "
                f"({time.time() - t_start:.1f}s)"
            )
    return state
