"""Device mesh and sharding helpers.

The reference's distributed runtime is one-process-per-GPU DDP with NCCL
all-reduce (reference: train.py:25-28, 51, 101-103). The TPU-native
equivalent: a single SPMD program over a `jax.sharding.Mesh`; the batch is
sharded over the 'data' axis, parameters are replicated, and XLA inserts the
gradient all-reduce (psum) over ICI/DCN automatically when the jitted train
step consumes sharded inputs.

The mesh is created 1-D ('data',) by default but the axis layout is a
parameter so tensor/sequence axes can be added without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_names: Sequence[str] = (DATA_AXIS,)) -> Mesh:
    """1-D mesh over all devices (or the given ones). Works identically for
    1 chip, 1 host, or multi-host (jax.devices() is global under SPMD)."""
    devices = list(devices) if devices is not None else jax.devices()
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host-local arrays with leading batch dim onto the
    mesh, sharded over 'data'.

    Each process passes its LOCAL shard (rank-strided by the sampler); the
    global logical batch is process_count * local_batch. The local batch size
    must be divisible by the local device count.
    """
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)), batch
    )


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
