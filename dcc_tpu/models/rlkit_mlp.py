"""rlkit-style MLP (flax) — the net family the reference's MADDPG uses.

Parity target: ``torchkit/networks.py:18-86`` ``Mlp``: GELU hidden
activations, fan-in-uniform hidden init with bias 0.1, final layer uniform
(+-3e-3); ``FlattenMlp`` concatenates inputs on the feature axis
(``networks.py:80-86``); the MADDPG actor wraps the output in tanh
(``algos/maddpg.py:13-17``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def fanin_init(key, shape, dtype=jnp.float32):
    """utils/pytorch_utils.py fanin_init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    on a (in, out) kernel."""
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def sym_uniform(scale: float):
    """U(-scale, scale) (torch's uniform_(-w, w); flax's uniform is U(0, s))."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class RlkitMlp(nn.Module):
    output_size: int
    hidden_sizes: Sequence[int] = (64,)
    init_w: float = 3e-3
    b_init_value: float = 0.1
    tanh_output: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_pre: bool = False):
        """``return_pre=True`` additionally returns the pre-squash output
        (rlkit's ``return_preactivations``; the MADDPG paper's reference
        implementation regularizes exactly this to prevent tanh
        saturation)."""
        for i, h in enumerate(self.hidden_sizes):
            x = nn.Dense(
                h,
                kernel_init=fanin_init,
                bias_init=nn.initializers.constant(self.b_init_value),
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            x = nn.gelu(x)
        x = nn.Dense(
            self.output_size,
            kernel_init=sym_uniform(self.init_w),
            bias_init=sym_uniform(self.init_w),
            dtype=self.dtype,
            name="last_fc",
        )(x)
        pre = x
        if self.tanh_output:
            x = jnp.tanh(x)
        if return_pre:
            return x, pre
        return x
