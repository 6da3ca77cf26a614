"""Tracing / profiling — the observability layer the reference lacks.

The reference's only instrumentation is a coarse wall-clock print per
iteration (``learner.py:129-130,310-315``; SURVEY.md section 5 "Tracing /
profiling: none"). Here every Learner phase is wrapped in a
:class:`PhaseTimer` (host wall-clock with device sync) and, when a trace
directory is configured, in ``jax.profiler`` annotations so the phases show
up as named spans in the XLA trace viewer (tensorboard / xprof / perfetto).

Usage::

    prof = Profiler(trace_dir="results/run/trace", trace_iters=(3, 5))
    for it in range(1, n_iters + 1):
        prof.maybe_start(it)
        with prof.phase("train"):
            ts, m = train(ts, key)
            jax.block_until_ready(m)
        prof.maybe_stop(it)
    print(prof.summary())

``trace_iters=(a, b)`` captures a device trace for iterations ``a..b`` only
(tracing the steady state, not the compile), which is the standard JAX
profiling recipe; phase timers run for the whole run at ~zero cost.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional, Tuple

import jax


class PhaseTimer:
    """Accumulates per-phase wall-clock stats (count / total / max)."""

    def __init__(self) -> None:
        self._stats: Dict[str, Tuple[int, float, float]] = {}

    def add(self, name: str, dt: float) -> None:
        n, tot, mx = self._stats.get(name, (0, 0.0, 0.0))
        self._stats[name] = (n + 1, tot + dt, max(mx, dt))

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"count": n, "total_s": tot, "mean_s": tot / n, "max_s": mx}
            for name, (n, tot, mx) in self._stats.items()
        }


class Profiler:
    """Phase timing + optional windowed ``jax.profiler`` trace capture."""

    def __init__(
        self,
        trace_dir: Optional[str] = None,
        trace_iters: Optional[Tuple[int, int]] = None,
    ) -> None:
        self.trace_dir = trace_dir
        self.trace_iters = trace_iters if trace_dir else None
        self.timer = PhaseTimer()
        self._tracing = False

    # -- windowed device-trace capture ---------------------------------
    def maybe_start(self, it: int) -> None:
        if self.trace_iters and not self._tracing and it == self.trace_iters[0]:
            jax.profiler.start_trace(self.trace_dir)
            self._tracing = True

    def maybe_stop(self, it: int) -> None:
        if self._tracing and it >= self.trace_iters[1]:
            jax.profiler.stop_trace()
            self._tracing = False

    def stop(self) -> None:
        """Idempotent shutdown (end-of-run / error paths)."""
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False

    # -- named phases ---------------------------------------------------
    @contextlib.contextmanager
    def phase(self, name: str):
        """Times a host-side phase and, while a trace is active, tags it as a
        ``TraceAnnotation`` span so it is attributable in the trace viewer.
        The caller is responsible for device sync (``block_until_ready``)
        inside the phase if it wants device time, not dispatch time."""
        ctx = (
            jax.profiler.TraceAnnotation(name)
            if self._tracing
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
        self.timer.add(name, time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return self.timer.summary()


__all__ = ["PhaseTimer", "Profiler"]
