from .coverage import EnvConfig, EnvState, StepOut, default_poi_bank, observation, reset, step
from .facade import DCEnv, VecDCEnv
from .policy import HeuristicCoveragePolicy, InteractivePolicy
from .spaces import Box, Discrete, MultiDiscrete
from .vector import reset_batch, share_obs_from_obs, step_batch

# ---------------------------------------------------------------------------
# Scenario registry. The reference resolves ``scenario_name`` by
# ``imp.load_source`` over scenario files (``scenarios/__init__.py:5-7``,
# Python<=3.11 only); here scenarios are plain entries mapping a name to the
# functional env triple (config_cls, reset, step). Third-party scenarios
# register with :func:`register_scenario` and become reachable from the YAML
# ``scenario_name`` key.
# ---------------------------------------------------------------------------
_SCENARIOS = {}


def register_scenario(name, *, config_cls, reset_fn, step_fn, observation_fn):
    """Register a scenario implementation under ``name``. Overwriting an
    existing name is an error (delete first) to avoid silent shadowing."""
    if name in _SCENARIOS:
        raise ValueError(f"scenario {name!r} already registered")
    _SCENARIOS[name] = {
        "config_cls": config_cls,
        "reset": reset_fn,
        "step": step_fn,
        "observation": observation_fn,
    }


def get_scenario(name):
    """Look up a registered scenario (KeyError lists what exists)."""
    try:
        return _SCENARIOS[name]
    except KeyError:
        raise KeyError(
            f"unknown scenario {name!r}; registered: {sorted(_SCENARIOS)}"
        ) from None


register_scenario(
    "coverage",
    config_cls=EnvConfig,
    reset_fn=reset,
    step_fn=step,
    observation_fn=observation,
)

__all__ = [
    "EnvConfig", "EnvState", "StepOut", "default_poi_bank", "observation",
    "reset", "step", "reset_batch", "step_batch", "share_obs_from_obs",
    "DCEnv", "VecDCEnv", "Box", "Discrete", "MultiDiscrete",
    "HeuristicCoveragePolicy", "InteractivePolicy",
    "register_scenario", "get_scenario",
]
