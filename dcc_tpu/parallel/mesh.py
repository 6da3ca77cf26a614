"""Device-mesh utilities for SPMD data-parallel training.

The reference's only parallelism is a 16-process pipe farm
(``envs/wrappers.py:133-201``); here scaling is a ``jax.sharding.Mesh`` over
an env ("data") axis: env states and trajectories are sharded along envs,
parameters are replicated, and XLA inserts the gradient ``psum`` over ICI
when the loss is reduced. Multi-host runs use the same program after
``jax.distributed.initialize`` — host-local devices join the global mesh.

Mesh axes are laid out so a model axis can be added later
(``Mesh(devices.reshape(-1, 1), ('data', 'model'))``) without changing the
training code; the tiny MLPs of this workload never need TP (SURVEY.md 2.2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, data_axis: str = "data"
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (data_axis,))


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """NamedSharding that shards array axis ``axis`` over the mesh's data
    axis and replicates the rest."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def constrain(tree, mesh: Optional[Mesh], axis: int):
    """Apply with_sharding_constraint(P(..., 'data', ...)) on ``axis`` of every
    leaf with ndim > axis. No-op when mesh is None."""
    if mesh is None:
        return tree

    def _c(x):
        if not hasattr(x, "ndim") or x.ndim <= axis:
            return x
        spec = [None] * x.ndim
        spec[axis] = mesh.axis_names[0]
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_c, tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
