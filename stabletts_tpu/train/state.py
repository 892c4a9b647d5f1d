"""Train state and epoch-granular checkpointing.

Checkpoint protocol mirrors the reference's directory-scan semantics
(reference: utils/load.py:7-43, train.py:91-93): per-epoch saves of model and
optimizer state; on resume the latest epoch present with BOTH is loaded; a
model-only checkpoint is loaded as a pretrained init at epoch 0 (the
documented finetune path). Storage is orbax-backed pytree checkpoints.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import optax


@dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any

    def replace(self, **kw):
        d = {"step": self.step, "params": self.params, "opt_state": self.opt_state}
        d.update(kw)
        return TrainState(**d)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state), None),
    lambda _, c: TrainState(step=c[0], params=c[1], opt_state=c[2]),
)

_CKPT_RE = re.compile(r"^checkpoint_(\d+)$")
_OPT_RE = re.compile(r"^optimizer_(\d+)$")


def _epochs(path: str, regex) -> set:
    if not os.path.isdir(path):
        return set()
    out = set()
    for name in os.listdir(path):
        m = regex.match(name)
        if m:
            out.add(int(m.group(1)))
    return out


def save_checkpoint(ckpt_dir: str, epoch: int, params, opt_state) -> None:
    """Save checkpoint_{epoch} (params) and optimizer_{epoch} (opt state).

    COLLECTIVE in multi-host runs: orbax barriers across all JAX processes,
    so every rank must call this (orbax no-ops the writes on non-primary
    hosts); ckpt_dir must be shared storage."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(ckpt_dir, f"checkpoint_{epoch}"), params, force=True)
    ckptr.save(os.path.join(ckpt_dir, f"optimizer_{epoch}"), opt_state, force=True)
    ckptr.wait_until_finished()


def continue_training(
    ckpt_dir: str, params, opt_state
) -> Tuple[int, Any, Any]:
    """Resume semantics of reference utils/load.py:7-43.

    Returns (start_epoch, params, opt_state): the max epoch present in BOTH
    checkpoint_{e} and optimizer_{e} is restored and start_epoch = e + 1;
    if only model checkpoints exist, the newest is loaded as a pretrained
    init with start_epoch = 0; otherwise everything is returned unchanged.
    """
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    model_epochs = _epochs(ckpt_dir, _CKPT_RE)
    opt_epochs = _epochs(ckpt_dir, _OPT_RE)
    ckptr = ocp.StandardCheckpointer()

    common = model_epochs & opt_epochs
    if common:
        e = max(common)
        params = ckptr.restore(os.path.join(ckpt_dir, f"checkpoint_{e}"), params)
        opt_state = ckptr.restore(os.path.join(ckpt_dir, f"optimizer_{e}"), opt_state)
        return e + 1, params, opt_state
    if model_epochs:
        e = max(model_epochs)
        params = ckptr.restore(os.path.join(ckpt_dir, f"checkpoint_{e}"), params)
        return 0, params, opt_state
    return 0, params, opt_state


_VOCOS_PARTS = ("generator", "mpd", "mrd", "optimizerd", "optimizerg")


def save_checkpoint_named(ckpt_dir: str, epoch: int, parts: dict) -> None:
    """Save named state parts as {name}_{epoch} dirs (vocos protocol:
    reference vocoders/vocos/train.py:150-155). COLLECTIVE in multi-host
    runs — call from every rank (see save_checkpoint)."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    for name, tree in parts.items():
        ckptr.save(os.path.join(ckpt_dir, f"{name}_{epoch}"), tree, force=True)
    ckptr.wait_until_finished()


def continue_training_vocos(ckpt_dir: str, state):
    """Vocos resume semantics (reference: vocoders/vocos/utils/load.py:7-53):
    restore the max epoch with ALL five parts; generator-only checkpoints act
    as a pretrained init at epoch 0."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    per_part = {
        p: _epochs(ckpt_dir, re.compile(rf"^{p}_(\d+)$")) for p in _VOCOS_PARTS
    }
    ckptr = ocp.StandardCheckpointer()
    common = set.intersection(*per_part.values()) if all(per_part.values()) else set()
    if common:
        e = max(common)
        return e + 1, state.replace(
            params_g=ckptr.restore(os.path.join(ckpt_dir, f"generator_{e}"), state.params_g),
            params_mpd=ckptr.restore(os.path.join(ckpt_dir, f"mpd_{e}"), state.params_mpd),
            params_mrd=ckptr.restore(os.path.join(ckpt_dir, f"mrd_{e}"), state.params_mrd),
            opt_g=ckptr.restore(os.path.join(ckpt_dir, f"optimizerg_{e}"), state.opt_g),
            opt_d=ckptr.restore(os.path.join(ckpt_dir, f"optimizerd_{e}"), state.opt_d),
        )
    if per_part["generator"]:
        e = max(per_part["generator"])
        return 0, state.replace(
            params_g=ckptr.restore(os.path.join(ckpt_dir, f"generator_{e}"), state.params_g)
        )
    return 0, state
