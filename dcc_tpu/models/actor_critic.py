"""Actor and centralized-critic networks (flax.linen).

Parity targets: ``algos/r_actor_critic.py`` — ``R_Actor:19-79`` (MLP/CNN
trunk -> optional GRU -> action head) and ``R_Critic:82-121`` (centralized-obs
trunk -> optional GRU -> value head with orthogonal gain-1 init). Action heads
use orthogonal init with gain 0.01 (``distributions.py:72-92``, mappo.yaml:25)
and a state-independent log-std parameter (the reference's AddBias).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cnn import CNNBase
from .mlp import MLPBase
from .rnn import MaskedGRU


class Actor(nn.Module):
    action_dim: int = 2
    discrete: bool = False
    hidden_size: int = 256
    layer_n: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    gain: float = 0.01
    use_rnn: bool = False
    recurrent_n: int = 1
    use_cnn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        obs: jnp.ndarray,
        rnn_state: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
    ):
        """Returns (dist_params, new_rnn_state).

        dist_params: (mean, log_std) for Box actions, logits for Discrete.
        """
        base = CNNBase if self.use_cnn else MLPBase
        kwargs = dict(
            hidden_size=self.hidden_size,
            use_relu=self.use_relu,
            use_orthogonal=self.use_orthogonal,
            dtype=self.dtype,
        )
        if not self.use_cnn:
            kwargs.update(
                layer_n=self.layer_n,
                use_feature_normalization=self.use_feature_normalization,
            )
        x = base(**kwargs, name="base")(obs)
        if self.use_rnn:
            x, rnn_state = MaskedGRU(
                hidden_size=self.hidden_size,
                recurrent_n=self.recurrent_n,
                use_orthogonal=self.use_orthogonal,
                name="rnn",
            )(x, rnn_state, masks)
        head_init = (
            nn.initializers.orthogonal(scale=self.gain)
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        out = nn.Dense(
            self.action_dim,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="act_out",
        )(x)
        if self.discrete:
            return out, rnn_state
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,), jnp.float32
        )
        return (out, log_std), rnn_state


class Critic(nn.Module):
    hidden_size: int = 256
    layer_n: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    use_rnn: bool = False
    recurrent_n: int = 1
    use_cnn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        cent_obs: jnp.ndarray,
        rnn_state: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
    ):
        base = CNNBase if self.use_cnn else MLPBase
        kwargs = dict(
            hidden_size=self.hidden_size,
            use_relu=self.use_relu,
            use_orthogonal=self.use_orthogonal,
            dtype=self.dtype,
        )
        if not self.use_cnn:
            kwargs.update(
                layer_n=self.layer_n,
                use_feature_normalization=self.use_feature_normalization,
            )
        x = base(**kwargs, name="base")(cent_obs)
        if self.use_rnn:
            x, rnn_state = MaskedGRU(
                hidden_size=self.hidden_size,
                recurrent_n=self.recurrent_n,
                use_orthogonal=self.use_orthogonal,
                name="rnn",
            )(x, rnn_state, masks)
        v_init = (
            nn.initializers.orthogonal(scale=1.0)
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        v = nn.Dense(
            1,
            kernel_init=v_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="v_out",
        )(x)
        return v, rnn_state
