"""Device mesh and sharding for data-parallel training.

The reference has no multi-device training at all (SURVEY.md §2.5: a single
``args.device`` string, no torch.distributed anywhere). Here scaling is the
idiomatic JAX way: a :class:`jax.sharding.Mesh` over all chips, the batch
sharded on the ``data`` axis, params/optimizer state replicated, and the
gradient all-reduce inserted by XLA from sharding propagation — riding ICI,
not host networking. No hand-written communication code.

Pattern: *computation follows data*. The loop ``device_put``s the dataset
tensor (replicated, or time-sharded for large domains), the train state
(replicated) and each step's index vector (batch-sharded); the already-jitted
step functions then compile against those shardings, with XLA inserting the
cross-chip psum for gradients.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axes: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1])) or 1
        shape[shape.index(-1)] = len(devices) // known
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch or time) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_batch(tree, mesh: Mesh, axis: str = "data"):
    return jax.device_put(tree, batch_sharding(mesh, axis))


def put_sharded(tree, mesh: Mesh, *spec):
    """device_put with an explicit PartitionSpec, e.g. put_sharded(x, mesh, None, 'data')."""
    return jax.device_put(tree, NamedSharding(mesh, P(*spec)))
