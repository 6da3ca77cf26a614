"""Algorithm factory (reference: ``algos/make_algo.py``), with the
reference's bug fixed: there ``make_algo`` exists but ``learner.py:48``
hardcodes shared MAPPO so MADDPG is unreachable; here ``algo_file`` in the
merged config actually selects the algorithm."""

from __future__ import annotations

from typing import Any, Dict

from ..envs import EnvConfig
from .maddpg import MADDPG, MADDPGConfig
from .mappo import MAPPO


def make_algo(cfg: Dict[str, Any], env_cfg: EnvConfig):
    algo_file = str(cfg.get("algo_file", "mappo"))
    if "maddpg" in algo_file:
        hidden = cfg.get("hidden_sizes_mlp", [64])
        mcfg = MADDPGConfig(
            actor_lr=float(cfg.get("actor_lr", 5e-4)),
            critic_lr=float(cfg.get("critic_lr", 1e-3)),
            gamma=float(cfg.get("gamma", 0.99)),
            tau=float(cfg.get("tau", 0.01)),
            hidden_sizes=tuple(int(h) for h in hidden),
            buffer_capacity=int(cfg.get("buffer_capacity", 100_000)),
            batch_size=int(cfg.get("batch_size", 256)),
            n_envs=int(cfg.get("n_rollout_threads", 16)),
            steps_per_iter=int(cfg.get("max_ep_len", 150)),
            updates_per_iter=int(cfg.get("updates_per_iter", 50)),
            warmup_steps=int(cfg.get("warmup_steps", 1000)),
        )
        return MADDPG(mcfg, env_cfg)
    if "mappo" in algo_file:
        from ..configs.loader import to_algo_config

        return MAPPO(to_algo_config(cfg), env_cfg)
    raise NotImplementedError(f"algo_file: {algo_file} not found")
