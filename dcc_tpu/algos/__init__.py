from .factory import make_algo
from .maddpg import MADDPG, MADDPGConfig, MADDPGState
from .mappo import MAPPO, MAPPOConfig, Metrics, TrainState, Trajectory

__all__ = [
    "MAPPO", "MAPPOConfig", "Metrics", "TrainState", "Trajectory",
    "MADDPG", "MADDPGConfig", "MADDPGState", "make_algo",
]
