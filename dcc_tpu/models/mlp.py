"""MLP trunks (flax.linen) with the reference's normalization/init scheme.

Parity target: ``algos/algo_utils/mlp.py:7-58`` — optional LayerNorm on the
raw features, then ``fc1 = Linear -> act -> LayerNorm`` followed by ``layer_N``
clones of ``Linear -> act -> LayerNorm``; orthogonal weight init with the
activation's gain, zero bias (``algo_utils/util.py:7-10``).

Compute dtype is configurable (bfloat16 for MXU-friendly training at scale);
parameters stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

RELU_GAIN = 2.0 ** 0.5  # nn.init.calculate_gain('relu')
TANH_GAIN = 5.0 / 3.0  # nn.init.calculate_gain('tanh')


class _LNParams(nn.Module):
    """Parameter shell matching ``nn.LayerNorm``'s tree (scale, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.dim,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.dim,), jnp.float32
        )
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter shell matching ``nn.Dense``'s tree (kernel, bias)."""

    features: int
    kernel_init: Callable[..., Any]

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return kernel, bias


class MLPBase(nn.Module):
    """LayerNorm(obs) -> [Dense -> act -> LayerNorm] x (1 + layer_N).

    With ``fused=True`` the whole trunk runs as the single Pallas kernel in
    :mod:`dcc_tpu.ops.fused_mlp` (VMEM-resident forward + rematerializing
    custom-VJP backward). The parameter tree is byte-identical to the flax
    path (same module names, shapes, and initializers), so checkpoints and
    the two execution paths interoperate freely.
    """

    hidden_size: int = 256
    layer_n: int = 1
    use_relu: bool = True
    use_feature_normalization: bool = True
    use_orthogonal: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype; None = float32
    fused: bool = False
    fused_block_rows: int = 256
    fused_interpret: bool = False  # CPU testing of the fused path
    # Multi-device mesh: the kernel is shard_map'd over the row (env) axis
    # so GSPMD keeps the env sharding instead of gathering operands around
    # the opaque custom call. None = single-device (no wrap).
    fused_mesh: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = nn.relu if self.use_relu else nn.tanh
        gain = RELU_GAIN if self.use_relu else TANH_GAIN
        if self.use_orthogonal:
            kinit = nn.initializers.orthogonal(scale=gain)
        else:
            kinit = nn.initializers.xavier_uniform()
        if self.fused:
            from ..ops.fused_mlp import fused_mlp

            flat = []
            if self.use_feature_normalization:
                flat += list(_LNParams(x.shape[-1], name="feature_norm")())
            d_in = x.shape[-1]
            for i in range(1 + self.layer_n):
                k, b = _DenseParams(
                    self.hidden_size, kernel_init=kinit, name=f"fc{i}"
                )(d_in)
                s, be = _LNParams(self.hidden_size, name=f"norm{i}")()
                flat += [k, b, s, be]
                d_in = self.hidden_size
            kernel_kw = dict(
                n_layers=1 + self.layer_n,
                use_feature_norm=self.use_feature_normalization,
                use_relu=self.use_relu,
                bf16=self.dtype == jnp.bfloat16,
                block_rows=self.fused_block_rows,
                interpret=self.fused_interpret,
            )
            mesh = self.fused_mesh
            rows = 1
            for d in x.shape[:-1]:
                rows *= d
            if (
                mesh is not None
                and mesh.devices.size > 1
                and rows % mesh.devices.size == 0
                and rows > 0
            ):
                # each shard runs the kernel on its local row block; params
                # ride in replicated (P()) — no collectives at all (pure
                # forward; the custom-VJP backward psums param cotangents
                # through shard_map's transpose automatically)
                lead = x.shape[:-1]
                x2 = x.reshape(rows, x.shape[-1])
                axis = mesh.axis_names[0]
                out2 = jax.shard_map(
                    lambda r, *ps: fused_mlp(r, list(ps), **kernel_kw),
                    mesh=mesh,
                    in_specs=(P(axis),) + (P(),) * len(flat),
                    out_specs=P(axis),
                    check_vma=False,
                )(x2, *flat)
                return out2.reshape(*lead, out2.shape[-1])
            return fused_mlp(x, flat, **kernel_kw)
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
