"""dcc_tpu: TPU-native multi-UAV dynamic coverage control framework.

A from-scratch JAX/XLA re-design of zhaozijie2022/dynamic-coverage-control:
pure-JAX vectorized coverage environment, on-device MAPPO actor-learner, and
SPMD scaling over TPU device meshes.
"""

__version__ = "0.1.0"
