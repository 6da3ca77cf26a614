"""Algorithm factory (reference: ``algos/make_algo.py``), with the
reference's bug fixed: there ``make_algo`` exists but ``learner.py:48``
hardcodes shared MAPPO so MADDPG is unreachable; here ``algo_file`` in the
merged config actually selects the algorithm, and the Learner builds
through this factory (``runtime/learner.py``)."""

from __future__ import annotations

from typing import Any, Dict

from ..envs import EnvConfig
from .maddpg import MADDPG
from .mappo import MAPPO


def make_algo(cfg: Dict[str, Any], env_cfg: EnvConfig, mesh=None):
    """Build the algorithm selected by ``algo_file`` (reference
    ``config/expt.yaml`` key; dispatch per ``algos/make_algo.py:5-46``)."""
    algo_file = str(cfg.get("algo_file", "mappo"))
    scenario = str(cfg.get("scenario_name", "coverage"))
    if "maddpg" in algo_file:
        from ..configs.loader import to_maddpg_config

        return MADDPG(to_maddpg_config(cfg), env_cfg, mesh=mesh, scenario=scenario)
    if "mappo" in algo_file:
        from ..configs.loader import to_algo_config

        return MAPPO(to_algo_config(cfg), env_cfg, mesh=mesh, scenario=scenario)
    raise NotImplementedError(f"algo_file: {algo_file} not found")
