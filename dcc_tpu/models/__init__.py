from . import distributions, popart, valuenorm
from .actor_critic import Actor, Critic
from .cnn import CNNBase
from .mlp import MLPBase
from .rnn import MaskedGRU

__all__ = [
    "Actor", "Critic", "CNNBase", "MLPBase", "MaskedGRU",
    "distributions", "popart", "valuenorm",
]
