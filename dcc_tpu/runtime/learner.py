"""Learner: host-side orchestration of the on-device training program.

The analog of the reference's ``Learner`` (``learner.py:21-322``) with the
same cadence — train / eval every ``eval_interval`` / render every
``render_interval`` / checkpoint every ``save_interval`` / log every
``log_interval`` — but all compute lives in jitted device programs; the host
loop only dispatches and logs. Run artifacts go to
``<main_save_path>/<save_name>/<MMDD_HHMM_sd{seed}>/`` with a ``config.json``
snapshot (``learner.py:111-120``).
"""

from __future__ import annotations

import datetime
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..algos.factory import make_algo
from ..configs.loader import load as load_config
from ..parallel import make_mesh, replicated
from ..parallel import distributed as dist
from ..render.gif import render_gif, rollout_states
from ..utils.profiling import Profiler
from . import checkpoint as ckpt


class Learner:
    def __init__(
        self,
        overrides: Optional[Dict[str, Any]] = None,
        use_mesh: bool = False,
        env_yaml: Optional[str] = None,
        algo_yaml: Optional[str] = None,
        expt_yaml: Optional[str] = None,
    ):
        self.cfg, self.env_cfg, self.algo_cfg = load_config(
            overrides, env_yaml=env_yaml, algo_yaml=algo_yaml, expt_yaml=expt_yaml
        )
        self.seed = int(self.cfg.get("seed", 0))

        # join the multi-process runtime if launched as one (no-op otherwise);
        # host-side side effects below are coordinator-only
        dist.initialize()
        self.is_coordinator = dist.is_coordinator()

        mesh = None
        if use_mesh and jax.device_count() > 1:
            mesh = make_mesh()
        self.mesh = mesh
        # algo_file selects the algorithm (ref config/expt.yaml semantics;
        # fixes the reference bug where learner.py:48 hardcodes MAPPO and
        # make_algo is dead code)
        self.algo = make_algo(self.cfg, self.env_cfg, mesh=mesh)

        key = jax.random.PRNGKey(self.seed)
        self.ts = self.algo.init_state(key)
        self.base_key = jax.random.fold_in(key, 7)
        if mesh is not None:
            rep = replicated(mesh)
            self.ts = jax.device_put(self.ts, rep)
            self.base_key = jax.device_put(self.base_key, rep)

        # jitted programs; per-iteration keys derive on device from
        # ts.iteration so the host loop dispatches exactly one call per iter
        def _train(ts, base_key):
            k = jax.random.fold_in(base_key, ts.iteration)
            return self.algo.train_iteration(ts, k)

        self._train = jax.jit(_train)
        n_eval = int(self.cfg.get("n_eval_rollout_threads", 16))
        self._eval = (
            jax.jit(lambda ts, k: self.algo.eval_iteration(ts, k, n_eval))
            if n_eval > 0
            else None
        )

        # run dir + config snapshot (learner.py:111-120). Checkpoint saves
        # are collective in a multi-process run (orbax: every process writes
        # its array shards), so is_save_model is NOT coordinator-gated; the
        # timestamped run dir is chosen by the coordinator and broadcast so
        # all processes write into the same location.
        self.is_save_model = bool(self.cfg.get("save_model", True))
        self.output_path = None
        if self.is_save_model:
            expt_name = None
            if self.is_coordinator:
                expt_name = (
                    datetime.datetime.now().strftime("%m%d_%H%M_") + f"sd{self.seed}"
                )
            expt_name = dist.broadcast_str(expt_name)
            self.output_path = os.path.join(
                str(self.cfg.get("main_save_path", "results/")),
                str(self.cfg.get("save_name", "uav_dcc")),
                expt_name,
            )
            os.makedirs(self.output_path, exist_ok=True)
            if self.is_coordinator:
                with open(os.path.join(self.output_path, "config.json"), "w") as f:
                    json.dump(self.cfg, f, indent=4, default=str)

        if self.cfg.get("load_model") and self.cfg.get("load_model_path"):
            self.load_model(str(self.cfg["load_model_path"]))
            print("!!!!!Note: Load model, done!!!!!")

        # per-phase timing + optional windowed device-trace capture
        # (SURVEY.md section 5: the reference has no tracing at all)
        trace_dir = self.cfg.get("profile_dir") or None
        trace_iters = None
        if trace_dir:
            span = str(self.cfg.get("profile_trace_iters", "3:5"))
            a, _, b = span.partition(":")
            trace_iters = (int(a), int(b or a))
        self.profiler = Profiler(trace_dir=trace_dir, trace_iters=trace_iters)

        # wandb (gated, learner.py:125-127)
        self.is_log_wandb = bool(self.cfg.get("log_wandb", False)) and self.is_coordinator
        self._wandb = None
        if self.is_log_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=str(self.cfg.get("save_name", "uav_dcc")),
                    group=str(self.cfg.get("algo_file", "mappo")),
                    name=os.path.basename(self.output_path or "run"),
                    config=self.cfg,
                )
            except Exception as e:  # pragma: no cover
                print(f"wandb unavailable ({e}); console logging only")
                self.is_log_wandb = False

        self._start = time.time()
        self._check = time.time()

    # ------------------------------------------------------------------
    def train(self):
        n_iters = int(self.cfg.get("n_iters", 200))
        eval_interval = int(self.cfg.get("eval_interval", 10))
        render_interval = int(self.cfg.get("render_interval", 200))
        save_interval = int(self.cfg.get("save_interval", 50))
        log_interval = int(self.cfg.get("log_interval", 1))

        for it in range(1, n_iters + 1):
            self.profiler.maybe_start(it)
            with self.profiler.phase("train"):
                self.ts, m = self._train(self.ts, self.base_key)
                if self.profiler.trace_iters is not None:
                    jax.block_until_ready(m)
            self.profiler.maybe_stop(it)

            logs: Dict[str, Dict[str, float]] = {}
            if it % log_interval == 0:
                # MAPPO returns a Metrics NamedTuple, MADDPG a dict; both
                # split into the reference's rollout_info / rl_train_info
                # sections (learner.py:305-308)
                md = dict(m._asdict()) if hasattr(m, "_asdict") else dict(m)
                logs["rollout_info"] = {
                    k: float(md.pop(k))
                    for k in ("reward", "coverage_rate")
                    if k in md
                }
                logs["rl_train_info"] = {k: float(v) for k, v in md.items()}

            if self._eval is not None and it % eval_interval == 0:
                with self.profiler.phase("eval"):
                    ev = self._eval(
                        self.ts, jax.random.fold_in(self.base_key, 10_000 + it)
                    )
                logs["test_rollout_info"] = {
                    "reward": float(ev["reward"]),
                    "coverage_rate": float(ev["coverage_rate"]),
                }

            if (
                it % render_interval == 0
                and self.output_path
                and self.is_coordinator
                and (
                    self.cfg.get("save_gifs", True)
                    or self.cfg.get("render_live", False)
                )
            ):
                with self.profiler.phase("render"):
                    self.render(os.path.join(self.output_path, f"models_{it}.gif"))

            if logs:
                self.log(it, logs)

            if self.is_save_model and it % save_interval == 0:
                with self.profiler.phase("save"):
                    path = os.path.join(self.output_path, f"models_{it}")
                    self.save_model(path)
                if self.is_coordinator:
                    print(f"model saved in {path}")

        self.profiler.stop()
        if self.is_coordinator and self.profiler.summary():
            print("phase timing:", json.dumps(self.profiler.summary()))
        if self._wandb is not None:
            self._wandb.finish()

    # ------------------------------------------------------------------
    def render(self, path: str):
        # n_render_rollout_threads envs, tiled into one grid GIF — the
        # reference's render farm (learner.py:195-210, wrappers.py:69-78);
        # frames shrink as the grid grows so the GIF stays bounded
        n_render = max(1, int(self.cfg.get("n_render_rollout_threads", 1)))
        states = rollout_states(
            self.algo,
            self.ts,
            jax.random.fold_in(self.base_key, 99),
            n_envs=n_render,
        )
        size = 700 if n_render == 1 else max(128, 700 // int(np.ceil(np.sqrt(n_render))))
        # render_gif draws the per-timestep (tiled, for n_render>1) frames
        # and writes the GIF only when asked — the live viewer replays the
        # SAME frame list, so nothing is drawn twice
        gif_path = path if self.cfg.get("save_gifs", True) else None
        frames = render_gif(self.env_cfg, states, gif_path, size=size)
        if self.cfg.get("render_live", False):
            # workstation analog of the reference's pyglet window
            # (environment.py:209-315): show the render episode in a live
            # matplotlib figure; headless hosts degrade to a frame sink
            self._live_render(frames)
        return states

    def _live_render(self, frames):
        from ..render.live import LiveViewer

        if not hasattr(self, "_live_viewer"):
            self._live_viewer = LiveViewer(title="dcc_tpu training")
        for frame in frames:
            self._live_viewer.show(frame)
        return self._live_viewer

    def log(self, it: int, logs: Dict[str, Dict[str, float]]):
        if self._wandb is not None:
            for _, d in logs.items():
                self._wandb.log(d, step=it)
        if not self.is_coordinator:
            return
        now = time.time()
        print(
            f"******** iter: {it}, iter_time: {now - self._check:.2f}s, "
            f"total_time: {now - self._start:.2f}s"
        )
        for key, d in logs.items():
            print(key + "".join(f", {k}: {v:.4f}" for k, v in d.items()))
        self._check = now

    def save_model(self, path: str):
        # Collective in a multi-process run: orbax's save itself begins with
        # a cross-process sync (sync_global_processes rides a Gloo
        # collective on this backend), so EVERY process must enter the save
        # — a coordinator-only call deadlocks the sync. Orbax's primary-host
        # logic decides who writes which bytes; the trailing barrier keeps
        # non-coordinators from racing into the next iteration mid-write.
        ckpt.save(path, self.ts)
        dist.barrier("save_model")

    def load_model(self, path: str):
        dist.barrier("load_model_enter")
        self.ts = ckpt.load(path, self.ts)
        dist.barrier("load_model_exit")
