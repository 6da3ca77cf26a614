"""Checkpointing: full train-state pytree via orbax.

A strict superset of the reference's persistence (pickle of the policy
object only, ``mappo.py:237-247``; optimizer/ValueNorm/RNG state lost,
SURVEY.md section 5): here the whole :class:`TrainState` — params, both Adam
states, ValueNorm/PopArt stats, update counters — round-trips, so resume is
exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save(path: str, ts: Any) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, ts)
        ckptr.wait_until_finished()


def load(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (an abstract or concrete
    TrainState from ``algo.init_state``)."""
    path = os.path.abspath(path)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
