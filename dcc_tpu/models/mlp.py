"""MLP trunks (flax.linen) with the reference's normalization/init scheme.

Parity target: ``algos/algo_utils/mlp.py:7-58`` — optional LayerNorm on the
raw features, then ``fc1 = Linear -> act -> LayerNorm`` followed by ``layer_N``
clones of ``Linear -> act -> LayerNorm``; orthogonal weight init with the
activation's gain, zero bias (``algo_utils/util.py:7-10``).

Compute dtype is configurable (bfloat16 for MXU-friendly training at scale);
parameters stay float32.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

RELU_GAIN = 2.0 ** 0.5  # nn.init.calculate_gain('relu')
TANH_GAIN = 5.0 / 3.0  # nn.init.calculate_gain('tanh')


class MLPBase(nn.Module):
    """LayerNorm(obs) -> [Dense -> act -> LayerNorm] x (1 + layer_N)."""

    hidden_size: int = 256
    layer_n: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype; None = float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = nn.relu if self.use_relu else nn.tanh
        gain = RELU_GAIN if self.use_relu else TANH_GAIN
        if self.use_orthogonal:
            kinit = nn.initializers.orthogonal(scale=gain)
        else:
            kinit = nn.initializers.xavier_uniform()
        if self.use_feature_normalization:
            x = nn.LayerNorm(dtype=self.dtype, name="feature_norm")(x)
        for i in range(1 + self.layer_n):
            x = nn.Dense(
                self.hidden_size,
                kernel_init=kinit,
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            x = act(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"norm{i}")(x)
        return x
