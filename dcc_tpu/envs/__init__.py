from .coverage import EnvConfig, EnvState, StepOut, default_poi_bank, observation, reset, step
from .facade import DCEnv, VecDCEnv
from .policy import HeuristicCoveragePolicy, InteractivePolicy
from .spaces import Box, Discrete, MultiDiscrete
from .vector import reset_batch, share_obs_from_obs, step_batch

__all__ = [
    "EnvConfig", "EnvState", "StepOut", "default_poi_bank", "observation",
    "reset", "step", "reset_batch", "step_batch", "share_obs_from_obs",
    "DCEnv", "VecDCEnv", "Box", "Discrete", "MultiDiscrete",
    "HeuristicCoveragePolicy", "InteractivePolicy",
]
