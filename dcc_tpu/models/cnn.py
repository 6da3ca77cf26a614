"""CNN trunk for image observations (unused in the coverage scenario, kept
for feature parity with the reference's rank-3-obs path,
``algos/algo_utils/cnn.py`` selected at ``r_actor_critic.py:33``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .mlp import RELU_GAIN, TANH_GAIN


class CNNBase(nn.Module):
    """Conv -> flatten -> 2x Dense, activation between; /255 input scaling
    (``cnn.py:28-43``). Input layout: (B, H, W, C) (NHWC, TPU-native; the
    reference uses NCHW)."""

    hidden_size: int = 256
    use_relu: bool = True
    use_orthogonal: bool = True
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = nn.relu if self.use_relu else nn.tanh
        gain = RELU_GAIN if self.use_relu else TANH_GAIN
        kinit = (
            nn.initializers.orthogonal(scale=gain)
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        x = x / 255.0
        x = nn.Conv(
            self.hidden_size // 2,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=1,
            padding="VALID",
            kernel_init=kinit,
            dtype=self.dtype,
        )(x)
        x = act(x)
        x = x.reshape(*x.shape[:-3], -1)  # flatten spatial dims, keep batch dims
        x = nn.Dense(self.hidden_size, kernel_init=kinit, dtype=self.dtype)(x)
        x = act(x)
        x = nn.Dense(self.hidden_size, kernel_init=kinit, dtype=self.dtype)(x)
        return act(x)
