from . import distributed
from .mesh import constrain, data_sharding, make_mesh, replicated

__all__ = ["constrain", "data_sharding", "distributed", "make_mesh", "replicated"]
