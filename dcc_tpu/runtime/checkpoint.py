"""Checkpointing: full train-state pytree via orbax.

A strict superset of the reference's persistence (pickle of the policy
object only, ``mappo.py:237-247``; optimizer/ValueNorm/RNG state lost,
SURVEY.md section 5): here the whole :class:`TrainState` — params, both Adam
states, ValueNorm/PopArt stats, update counters — round-trips, so resume is
exact.

Multi-process runs: orbax refuses host-local ``jax.Array`` leaves in a
multi-host runtime (each process's state lives on its own local device).
Fully-replicated state is therefore converted to global arrays over a
replicated mesh of all processes' devices before the collective save, and
converted back to host-local arrays after restore — every process ends up
holding the same bytes it would in a single-process run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _global_replicated_mesh():
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("all",))


def _to_global(tree):
    """Host-local fully-replicated leaves -> global replicated jax.Arrays
    (every process holds the full value; P() marks it replicated)."""
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    mesh = _global_replicated_mesh()

    def conv(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return mhu.host_local_array_to_global_array(x, mesh, P())
        return x

    return jax.tree_util.tree_map(conv, tree)


def _to_local(tree):
    """Global replicated jax.Arrays -> host-local arrays on this process."""
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    mesh = _global_replicated_mesh()

    def conv(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return mhu.global_array_to_host_local_array(x, mesh, P())
        return x

    return jax.tree_util.tree_map(conv, tree)


def save(path: str, ts: Any) -> None:
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        ts = _to_global(ts)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ts)
        ckptr.wait_until_finished()


def load(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (an abstract or concrete
    TrainState from ``algo.init_state``)."""
    path = os.path.abspath(path)
    multiproc = jax.process_count() > 1
    if multiproc:
        # restore as global replicated arrays (matching how save stored them)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sharding = NamedSharding(_global_replicated_mesh(), P())
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jax.numpy.shape(x), jax.numpy.result_type(x), sharding=sharding
            ),
            template,
        )
    else:
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template
        )
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    if multiproc:
        restored = _to_local(restored)
    return restored
