"""Run the torch/numpy reference's FULL training loop and record its
learning curve (per-iteration reward + coverage_rate + losses).

This is the north-star parity artifact (BASELINE.md "Fidelity" row): the
reference publishes only curve *images* (`asset/cc.png`), so we regenerate
the underlying series by driving the reference's own ``Learner``
(``/root/reference/uav_dcc_control/learner.py:132-175``) on CPU with its
shipped default config (200 iters x 150 steps x 16 envs, shared MAPPO).

Faithfulness notes:
* The exact per-iter loop body of ``Learner.train`` (lr_decay -> rollout ->
  rl_update) is reproduced including the extra initial ``warmup`` call; only
  the eval/render/save side branches are disabled (they do not enter the
  training math, though skipping eval removes its draws from the global
  torch RNG stream -- covered by the seed band).
* ``SubprocVecEnv`` is swapped for ``DummyVecEnv`` with the same 16 env fns:
  the reference's own implicit equivalence contract (SURVEY.md section 4),
  mathematically identical and far faster on a 2-core host.
* Missing legacy deps (omegaconf, wandb, gym 0.10, imp) are shimmed.

Usage: python scripts/run_reference_curve.py SEED [OUT_DIR]
Writes OUT_DIR/reference_seed{SEED}.json with per-iter series.

``REF_CURVE_CONFIG=connect`` records the connectivity-preservation variant
(BASELINE config #2 behavior; the reference's cov2/cov3 results,
``ReadMe.md:78-84``): ``comm_force_scale=5.0`` on the same 4x20 shape. The
reference as shipped never forwards the scale into the world
(``scenarios/coverage.py:34`` builds ``CoverageWorld()`` bare — SURVEY.md
2.4 quirk #1), so the runner flips the ``CoverageWorld`` ctor defaults so
every world the farm builds gets the scales — the reference's own pull-
force physics (``CoverageWorld.py:100-140``), just actually switched on.
Output goes to reference_connect_seed{SEED}.json.
"""

import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from record_golden import _install_shims  # noqa: E402  (gym + imp shims)

REF = "/root/reference/uav_dcc_control"


class _AttrDict(dict):
    """Minimal DictConfig stand-in: dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _install_extra_shims():
    """Shim omegaconf + wandb (not installed here; learner.py imports both)."""
    if "omegaconf" not in sys.modules:
        import yaml

        om = types.ModuleType("omegaconf")

        class OmegaConf:
            @staticmethod
            def load(path):
                with open(path) as f:
                    raw = yaml.safe_load(f) or {}
                # PyYAML (YAML 1.1) parses `5e-4` as a string; the real
                # OmegaConf yields a float. Coerce scientific-notation strings.
                import re

                num = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)$")
                for k, v in raw.items():
                    if isinstance(v, str) and num.match(v):
                        raw[k] = float(v)
                return _AttrDict(raw)

            @staticmethod
            def merge(*cfgs):
                out = _AttrDict()
                for c in cfgs:
                    out.update(c)
                return out

            @staticmethod
            def to_container(cfg, resolve=True):
                return dict(cfg)

        om.OmegaConf = OmegaConf
        om.DictConfig = _AttrDict
        sys.modules["omegaconf"] = om

    if "wandb" not in sys.modules:
        wb = types.ModuleType("wandb")
        wb.init = lambda *a, **k: None
        wb.log = lambda *a, **k: None
        wb.finish = lambda *a, **k: None
        sys.modules["wandb"] = wb


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "benchmarks", "learning_curves")
    )
    os.makedirs(out_dir, exist_ok=True)

    _install_shims()
    _install_extra_shims()
    sys.path.insert(0, REF)

    import torch

    torch.set_num_threads(1)

    from omegaconf import OmegaConf

    env_cfg = OmegaConf.load(os.path.join(REF, "config/env_config/dcc.yaml"))
    algo_cfg = OmegaConf.load(os.path.join(REF, "config/algo_config/mappo.yaml"))
    expt_cfg = OmegaConf.load(os.path.join(REF, "config/expt.yaml"))
    cfg = OmegaConf.merge(env_cfg, algo_cfg, expt_cfg)

    cfg.seed = seed
    variant = os.environ.get("REF_CURVE_CONFIG", "default")
    if variant == "connect":
        # connectivity-preservation on: same 4x20 shape (make_world hardcodes
        # 4/20 — coverage.py:40-41), pull force enabled at the strength the
        # 5uav_dense_conn preset uses
        cfg.comm_force_scale = 5.0
        cfg.comm_r_scale = 0.95
        # The scenario loader re-imports coverage.py fresh per env (imp shim),
        # but its `from ...CoverageWorld import CoverageWorld` resolves to the
        # one shared class object — so flipping the ctor defaults switches the
        # force on in every world the farm builds.
        from envs.mpe.multiagent.CoverageWorld import CoverageWorld as _CW

        _CW.__init__.__defaults__ = (0.95, 5.0)
    elif variant != "default":
        raise SystemExit(f"unknown REF_CURVE_CONFIG {variant!r}")
    if os.environ.get("REF_CURVE_ITERS"):  # smoke-test hook
        cfg.n_iters = int(os.environ["REF_CURVE_ITERS"])
    cfg.log_wandb = False
    cfg.save_model = False
    # disable the non-training side branches (eval/render farms)
    cfg.n_eval_rollout_threads = 0
    cfg.n_render_rollout_threads = 0
    big = 10**9
    cfg.eval_interval = big
    cfg.render_interval = big
    cfg.save_interval = big

    import utils.pytorch_utils as ptu

    ptu.set_gpu_mode(False)

    # DummyVecEnv == SubprocVecEnv semantics (wrappers.py:204-261 mirrors
    # :133-201); on this host the 16-process farm would thrash 2 cores.
    import envs.make_env as me
    from envs.wrappers import DummyVecEnv

    me.SubprocVecEnv = DummyVecEnv

    from learner import Learner

    learner = Learner(cfg)

    # === Learner.train (learner.py:132-175) minus eval/render/save ===
    series = {
        "reward": [],
        "coverage_rate": [],
        "value_loss": [],
        "policy_loss": [],
        "dist_entropy": [],
        "ratio": [],
        "iter_time_s": [],
    }
    learner.warmup(learner.rl_buffer, learner.train_envs)
    t_start = time.time()
    for iter_ in range(1, learner.n_iters + 1):
        t0 = time.time()
        if learner.use_linear_lr_decay:
            learner.trainer.policy.lr_decay(iter_, learner.n_iters)
        rollout_info = learner.rollout(learner.rl_buffer, learner.train_envs)
        rl_train_info = learner.rl_update()
        dt = time.time() - t0
        series["reward"].append(float(rollout_info["reward"]))
        series["coverage_rate"].append(float(rollout_info["coverage_rate"]))
        series["value_loss"].append(float(rl_train_info["value_loss"]))
        series["policy_loss"].append(float(rl_train_info["policy_loss"]))
        series["dist_entropy"].append(float(rl_train_info["dist_entropy"]))
        series["ratio"].append(float(rl_train_info["ratio"]))
        series["iter_time_s"].append(round(dt, 3))
        if iter_ % 10 == 0 or iter_ == 1:
            print(
                f"[ref sd{seed}] iter {iter_}/{learner.n_iters} "
                f"reward {rollout_info['reward']:.1f} "
                f"coverage {rollout_info['coverage_rate']:.3f} ({dt:.1f}s/iter)",
                flush=True,
            )
        # incremental save so a partial run is still usable
        if iter_ % 10 == 0 or iter_ == learner.n_iters:
            _dump(out_dir, seed, cfg, series, time.time() - t_start, variant)

    learner.train_envs.close()
    _dump(out_dir, seed, cfg, series, time.time() - t_start, variant)
    print(f"[ref sd{seed}] done in {time.time() - t_start:.0f}s", flush=True)


def _dump(out_dir, seed, cfg, series, elapsed, variant="default"):
    payload = {
        "system": "reference (torch, DummyVecEnv x16, CPU)",
        "seed": seed,
        "n_iters": int(cfg.n_iters),
        "n_rollout_threads": int(cfg.n_rollout_threads),
        "max_ep_len": int(cfg.max_ep_len),
        "elapsed_s": round(elapsed, 1),
        "series": series,
    }
    stem = "reference" if variant == "default" else f"reference_{variant}"
    path = os.path.join(out_dir, f"{stem}_seed{seed}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
