"""Checkpoint save/restore via orbax (capability the reference lacks for the
prob-U-Net — its main.py saves no checkpoints; baseline/main.py:108-109 saves
state_dicts with no resume path). Here: params + optimizer state + step, with
restore for true resume."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from probunet_tpu.train.state import TrainState

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def save_checkpoint(directory: str, state: TrainState, name: str = "state") -> str:
    path = os.path.abspath(os.path.join(directory, name))
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    else:  # minimal .npz fallback
        flat, treedef = jax.tree.flatten(jax.device_get(state))
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"), *flat)
    return path


def restore_checkpoint(directory: str, template: TrainState, name: str = "state") -> TrainState:
    """Restore into ``template``'s structure. The template may be a real state
    or an abstract one (``jax.ShapeDtypeStruct`` leaves from ``jax.eval_shape``)
    — orbax restores from shapes/dtypes alone, so serving never pays a real
    model init just to build the restore target."""
    path = os.path.abspath(os.path.join(directory, name))
    abstract = any(isinstance(l, jax.ShapeDtypeStruct) for l in jax.tree.leaves(template))
    if ocp is not None:
        ckptr = ocp.StandardCheckpointer()
        target = template if abstract else jax.device_get(template)
        restored = ckptr.restore(path, target=target)
        return TrainState(*restored) if not isinstance(restored, TrainState) else restored
    flat, treedef = jax.tree.flatten(template)
    data = np.load(os.path.join(path, "state.npz"))
    return jax.tree.unflatten(treedef, [data[k] for k in data.files])
