"""Profiler phase timing, windowed trace capture, multi-host launch shims."""

import os
import time

import jax

from dcc_tpu.parallel import distributed as dist
from dcc_tpu.utils.profiling import PhaseTimer, Profiler


def test_phase_timer_stats():
    t = PhaseTimer()
    t.add("train", 0.5)
    t.add("train", 1.5)
    t.add("eval", 0.25)
    s = t.summary()
    assert s["train"]["count"] == 2
    assert abs(s["train"]["total_s"] - 2.0) < 1e-9
    assert abs(s["train"]["mean_s"] - 1.0) < 1e-9
    assert abs(s["train"]["max_s"] - 1.5) < 1e-9
    assert s["eval"]["count"] == 1


def test_profiler_phases_without_tracing():
    prof = Profiler()
    with prof.phase("train"):
        time.sleep(0.01)
    with prof.phase("train"):
        pass
    s = prof.summary()
    assert s["train"]["count"] == 2
    assert s["train"]["max_s"] >= 0.01
    # no trace configured: start/stop are no-ops
    prof.maybe_start(1)
    prof.maybe_stop(1)
    prof.stop()


def test_profiler_windowed_trace(tmp_path):
    trace_dir = str(tmp_path / "trace")
    prof = Profiler(trace_dir=trace_dir, trace_iters=(2, 3))
    x = jax.numpy.ones((128, 128))
    f = jax.jit(lambda a: a @ a)
    for it in range(1, 5):
        prof.maybe_start(it)
        assert prof._tracing == (2 <= it <= 3)
        with prof.phase("train"):
            jax.block_until_ready(f(x))
        prof.maybe_stop(it)
    assert not prof._tracing
    prof.stop()  # idempotent
    # the capture produced an xplane artifact under the trace dir
    found = [
        os.path.join(r, f)
        for r, _, fs in os.walk(trace_dir)
        for f in fs
    ]
    assert found, "trace capture wrote no files"
    assert prof.summary()["train"]["count"] == 4


def test_distributed_single_process_shims():
    # single-process: initialize is a no-op, this process is the coordinator
    dist.initialize()
    assert dist.is_coordinator()
    assert dist.process_count() == 1
    dist.barrier()  # no-op, must not hang
    # idempotent
    dist.initialize()


def test_learner_profiler_wired(tmp_path):
    from dcc_tpu.runtime import Learner

    learner = Learner(
        dict(
            n_iters=2,
            n_rollout_threads=2,
            n_eval_rollout_threads=0,
            max_ep_len=4,
            ppo_epoch=1,
            save_interval=100,
            render_interval=100,
            main_save_path=str(tmp_path),
            profile_dir=str(tmp_path / "trace"),
            profile_trace_iters="1:1",
        )
    )
    learner.train()
    s = learner.profiler.summary()
    assert s["train"]["count"] == 2
    assert os.path.isdir(str(tmp_path / "trace"))
