"""Multi-host (multi-process) launch layer.

The reference has no multi-node capability at all — its only transport is
the ``multiprocessing.Pipe`` env farm inside one host (``envs/wrappers.py``;
SURVEY.md section 2.2 "NCCL/MPI/Gloo/UCX: none"). The TPU-native design
needs exactly one host-side primitive instead: ``jax.distributed.initialize``
so every process sees the global device set, after which the *same* SPMD
train program runs unchanged — the mesh spans all hosts and XLA routes the
gradient ``psum`` over ICI/DCN (SURVEY.md section 5 "failure detection":
standard JAX fail-stop + restart from checkpoint).

Control-plane primitives (who is coordinator, run-dir broadcast, barriers)
ride the **coordination-service KV store** that ``jax.distributed``
establishes, NOT device collectives: they must work before any device
computation, and on backends whose device set is not globally aggregated.
Host-side side effects (run dirs, config.json, wandb, console logs) must
run on exactly one process — gate them with :func:`is_coordinator`.
Checkpoint saves are collective (orbax: every process writes its shards).
"""

from __future__ import annotations

import itertools
import os
from typing import Optional

import jax

_initialized = False
_uniq = itertools.count()


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
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
    # Tolerant-by-default liveness: on oversubscribed hosts (CI, shared dev
    # boxes) a CPU-starved peer can miss heartbeats and get terminated by
    # the coordination service mid-test. DCC_HEARTBEAT_TIMEOUT_S overrides;
    # explicit kwargs win.
    hb = os.environ.get("DCC_HEARTBEAT_TIMEOUT_S")
    if hb is not None:
        kwargs.setdefault("heartbeat_timeout_seconds", int(hb))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True


def _global_state():
    """The jax distributed runtime state (None-ish when not attached)."""
    from jax._src import distributed as _d

    return _d.global_state


def process_count() -> int:
    """Global process count. Prefers the distributed-runtime state over the
    backend (the backend under-reports when its device set is not globally
    aggregated, e.g. multi-process CPU)."""
    gs = _global_state()
    if gs.client is not None and gs.num_processes:
        return int(gs.num_processes)
    return jax.process_count()


def process_index() -> int:
    gs = _global_state()
    if gs.client is not None and gs.process_id is not None:
        return int(gs.process_id)
    return jax.process_index()


def is_coordinator() -> bool:
    """True on the process that owns host-side side effects (logs, ckpt)."""
    return process_index() == 0


def broadcast_str(s: Optional[str], timeout_ms: int = 60_000) -> str:
    """Broadcast a string from the coordinator to every process (identity
    when single-process). Used for the timestamped run directory so all
    processes agree on the checkpoint path (orbax multi-process saves
    require every process to write into the same location).

    Implemented over the coordination-service KV store so it works before
    any device computation and on any backend."""
    if process_count() == 1:
        return s or ""
    client = _global_state().client
    key = f"dcc/bcast/{next(_uniq)}"
    if is_coordinator():
        client.key_value_set(key, s or "")
        return s or ""
    return client.blocking_key_value_get(key, timeout_ms)


def barrier(name: str = "dcc_barrier", timeout_ms: int = 600_000) -> None:
    """Block until every process reaches this point (no-op single-process).
    Used around checkpoint save/restore so non-coordinators don't race ahead
    into the next iteration's collective with the coordinator still writing.

    Rides the coordination service's barrier primitive; each call site gets
    a unique barrier id so repeated barriers with the same name don't
    collide."""
    if process_count() == 1:
        return
    client = _global_state().client
    client.wait_at_barrier(f"dcc/{name}/{next(_uniq)}", timeout_ms)


__all__ = [
    "initialize",
    "is_coordinator",
    "process_count",
    "process_index",
    "barrier",
    "broadcast_str",
]
