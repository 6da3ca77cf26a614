from .mappo import MAPPO, MAPPOConfig, Metrics, TrainState, Trajectory

__all__ = ["MAPPO", "MAPPOConfig", "Metrics", "TrainState", "Trajectory"]
