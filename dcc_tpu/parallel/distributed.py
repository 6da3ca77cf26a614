"""Multi-host (multi-process) launch layer.

The reference has no multi-node capability at all — its only transport is
the ``multiprocessing.Pipe`` env farm inside one host (``envs/wrappers.py``;
SURVEY.md section 2.2 "NCCL/MPI/Gloo/UCX: none"). The TPU-native design
needs exactly one host-side primitive instead: ``jax.distributed.initialize``
so every process sees the global device set, after which the *same* SPMD
train program runs unchanged — the mesh spans all hosts and XLA routes the
gradient ``psum`` over ICI/DCN (SURVEY.md section 5 "failure detection":
standard JAX fail-stop + restart from checkpoint).

Host-side side effects (run dirs, config.json, wandb, checkpoint writes,
console logs) must run on exactly one process — gate them with
:func:`is_coordinator`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-process JAX runtime (idempotent).

    With no arguments, defers to ``jax.distributed.initialize()``'s
    auto-detection (TPU pod metadata / SLURM / Open MPI env). Explicit
    arguments may come from any launcher via the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)
    or be passed directly. Single-process runs skip initialization entirely,
    so the same entry point works from one chip to a pod slice.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_coordinator() -> bool:
    """True on the process that owns host-side side effects (logs, ckpt)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def barrier(name: str = "dcc_barrier") -> None:
    """Block until every process reaches this point (no-op single-process).
    Used around checkpoint save/restore so non-coordinators don't race ahead
    into the next iteration's collective with the coordinator still writing.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


__all__ = ["initialize", "is_coordinator", "process_count", "barrier"]
