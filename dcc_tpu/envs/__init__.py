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


def register_scenario(
    name, *, config_cls, reset_fn, step_fn, observation_fn, config_from_yaml=None
):
    """Register a scenario implementation under ``name``. Overwriting an
    existing name is an error (delete first) to avoid silent shadowing.

    ``config_from_yaml`` (optional): merged-yaml dict -> config instance;
    the config loader uses it to build the env config for non-default
    scenarios selected by the ``scenario_name`` yaml key."""
    if name in _SCENARIOS:
        raise ValueError(f"scenario {name!r} already registered")
    _SCENARIOS[name] = {
        "config_cls": config_cls,
        "reset": reset_fn,
        "step": step_fn,
        "observation": observation_fn,
        "config_from_yaml": config_from_yaml,
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

from . import spread as _spread  # noqa: E402  (registered below)

register_scenario(
    "spread",
    config_cls=_spread.SpreadConfig,
    reset_fn=_spread.reset,
    step_fn=_spread.step,
    observation_fn=_spread.observation,
    config_from_yaml=_spread.config_from_yaml,
)

__all__ = [
    "EnvConfig", "EnvState", "StepOut", "default_poi_bank", "observation",
    "reset", "step", "reset_batch", "step_batch", "share_obs_from_obs",
    "DCEnv", "VecDCEnv", "Box", "Discrete", "MultiDiscrete",
    "HeuristicCoveragePolicy", "InteractivePolicy",
    "register_scenario", "get_scenario",
]
