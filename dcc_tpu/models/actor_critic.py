"""Actor and centralized-critic networks (flax.linen).

Parity targets: ``algos/r_actor_critic.py`` — ``R_Actor:19-79`` (MLP/CNN
trunk -> optional GRU -> action head) and ``R_Critic:82-121`` (centralized-obs
trunk -> optional GRU -> value head with orthogonal gain-1 init). Action heads
use orthogonal init with gain 0.01 (``distributions.py:72-92``, mappo.yaml:25)
and a state-independent log-std parameter (the reference's AddBias).

Both modules expose a single-step ``__call__`` (rollout) and a ``sequence``
method (training-time evaluation over a full (T, B, .) rollout with
mask-resets — the scan equivalent of the reference's done-boundary chunking,
``rnn.py:31-77``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .cnn import CNNBase
from .mlp import MLPBase
from .rnn import MaskedGRU


class _Trunk(nn.Module):
    """Shared trunk builder: MLP (or CNN for rank-3 obs) + optional GRU."""

    hidden_size: int = 256
    layer_n: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    use_rnn: bool = False
    recurrent_n: int = 1
    use_cnn: bool = False
    dtype: Optional[jnp.dtype] = None
    fused: bool = False  # Pallas fused trunk (ops/fused_mlp)
    fused_interpret: bool = False
    fused_block_rows: int = 512
    fused_mesh: Optional[object] = None  # shard_map the kernel over rows

    def setup(self):
        if self.use_cnn:
            self.base = CNNBase(
                hidden_size=self.hidden_size,
                use_relu=self.use_relu,
                use_orthogonal=self.use_orthogonal,
                dtype=self.dtype,
                name="base",
            )
        else:
            self.base = MLPBase(
                hidden_size=self.hidden_size,
                layer_n=self.layer_n,
                use_relu=self.use_relu,
                use_feature_normalization=self.use_feature_normalization,
                use_orthogonal=self.use_orthogonal,
                dtype=self.dtype,
                fused=self.fused,
                fused_interpret=self.fused_interpret,
                fused_block_rows=self.fused_block_rows,
                fused_mesh=self.fused_mesh,
                name="base",
            )
        if self.use_rnn:
            self.rnn = MaskedGRU(
                hidden_size=self.hidden_size,
                recurrent_n=self.recurrent_n,
                use_orthogonal=self.use_orthogonal,
                name="rnn",
            )

    def features(self, obs, rnn_state, masks):
        x = self.base(obs)
        if self.use_rnn:
            x, rnn_state = self.rnn(x, rnn_state, masks)
        return x, rnn_state

    def features_seq(self, obs_seq, h0, masks_seq):
        x = self.base(obs_seq)  # feature-wise, works on (T, B, D)
        if self.use_rnn:
            x, h0 = self.rnn.sequence(x, h0, masks_seq)
        return x, h0


class Actor(_Trunk):
    """Trunk + action head. The head is the ACTLayer analog
    (``act.py:19-41``): ``head_kind`` dispatches on the action-space class —

    * ``gaussian`` (Box): Dense mean + state-independent log_std
    * ``categorical`` (Discrete): Dense logits
    * ``multi_discrete`` (MultiDiscrete): one Dense per branch,
      ``head_dims`` = per-branch category counts
    * ``multi_binary`` (MultiBinary): Dense Bernoulli logits
    * ``mixed`` (Tuple[Box, Discrete]): gaussian + categorical heads,
      ``head_dims`` = (continuous_dim, discrete_n)

    When ``head_kind`` is empty it derives from the legacy ``discrete``
    flag. Head outputs are consumed by
    :func:`dcc_tpu.models.distributions.sample_head` / ``evaluate_head``.
    """

    action_dim: int = 2
    discrete: bool = False
    gain: float = 0.01
    head_kind: str = ""
    head_dims: Tuple[int, ...] = ()

    @property
    def kind(self) -> str:
        if self.head_kind:
            return self.head_kind
        return "categorical" if self.discrete else "gaussian"

    def setup(self):
        super().setup()
        head_init = (
            nn.initializers.orthogonal(scale=self.gain)
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        dense = lambda n, name: nn.Dense(
            n,
            kernel_init=head_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=name,
        )
        kind = self.kind
        if kind == "multi_discrete":
            self.act_outs = [
                dense(n, f"act_out{i}") for i, n in enumerate(self.head_dims)
            ]
        elif kind == "mixed":
            cont_dim, disc_n = self.head_dims
            self.act_out = dense(cont_dim, "act_out")
            self.act_out_disc = dense(disc_n, "act_out_disc")
            self.log_std = self.param(
                "log_std", nn.initializers.zeros, (cont_dim,), jnp.float32
            )
        else:
            self.act_out = dense(self.action_dim, "act_out")
            if kind == "gaussian":
                self.log_std = self.param(
                    "log_std", nn.initializers.zeros, (self.action_dim,), jnp.float32
                )

    def _head(self, x):
        # Distribution math stays float32 regardless of the trunk's compute
        # dtype (mixed precision: bf16 matmuls, f32 log-probs/entropy).
        kind = self.kind
        if kind == "multi_discrete":
            return tuple(h(x).astype(jnp.float32) for h in self.act_outs)
        if kind == "mixed":
            return (
                (self.act_out(x).astype(jnp.float32), self.log_std),
                self.act_out_disc(x).astype(jnp.float32),
            )
        out = self.act_out(x).astype(jnp.float32)
        if kind == "categorical" or kind == "multi_binary":
            return out
        return (out, self.log_std)

    def __call__(self, obs, rnn_state=None, masks=None):
        x, rnn_state = self.features(obs, rnn_state, masks)
        return self._head(x), rnn_state

    def sequence(self, obs_seq, h0=None, masks_seq=None):
        x, h = self.features_seq(obs_seq, h0, masks_seq)
        return self._head(x), h


class Critic(_Trunk):
    def setup(self):
        super().setup()
        v_init = (
            nn.initializers.orthogonal(scale=1.0)
            if self.use_orthogonal
            else nn.initializers.xavier_uniform()
        )
        self.v_out = nn.Dense(
            1,
            kernel_init=v_init,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="v_out",
        )

    def __call__(self, cent_obs, rnn_state=None, masks=None):
        x, rnn_state = self.features(cent_obs, rnn_state, masks)
        # value targets / GAE stay float32 (see Actor._head)
        return self.v_out(x).astype(jnp.float32), rnn_state

    def sequence(self, cent_obs_seq, h0=None, masks_seq=None):
        x, h = self.features_seq(cent_obs_seq, h0, masks_seq)
        return self.v_out(x).astype(jnp.float32), h
