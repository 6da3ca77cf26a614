"""Functional value normalizer (running mean/var with debiasing).

Parity target: ``utils/valuenorm.py:8-79`` — EMA of mean and mean-square with
beta=0.99999, debiasing term, var clamped at 1e-2, debias clamped at eps.
State lives in an explicit pytree threaded through the train step (the
reference keeps it in non-grad nn.Parameters and calls ``update`` inside
every ppo_update, ``mappo.py:106-107``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ValueNormState(NamedTuple):
    mean: jax.Array  # (1,)
    mean_sq: jax.Array  # (1,)
    debias: jax.Array  # ()
    beta: jax.Array = jnp.asarray(0.99999, jnp.float32)
    epsilon: jax.Array = jnp.asarray(1e-5, jnp.float32)


def init(dtype=jnp.float32, beta: float = 0.99999, epsilon: float = 1e-5) -> ValueNormState:
    return ValueNormState(
        mean=jnp.zeros((1,), dtype),
        mean_sq=jnp.zeros((1,), dtype),
        debias=jnp.zeros((), dtype),
        beta=jnp.asarray(beta, dtype),
        epsilon=jnp.asarray(epsilon, dtype),
    )


def _stats(st: ValueNormState):
    debias = jnp.clip(st.debias, min=st.epsilon)
    mean = st.mean / debias
    mean_sq = st.mean_sq / debias
    var = jnp.clip(mean_sq - mean**2, min=1e-2)
    return mean, var


def update(st: ValueNormState, batch: jax.Array) -> ValueNormState:
    """batch: (..., 1); mean over all leading axes (norm_axes=1 semantics on a
    flattened (B, 1) input, valuenorm.py:45-55)."""
    flat = batch.reshape(-1, batch.shape[-1]).astype(st.mean.dtype)
    bm = flat.mean(axis=0)
    bsq = (flat**2).mean(axis=0)
    w = st.beta
    return st._replace(
        mean=st.mean * w + bm * (1.0 - w),
        mean_sq=st.mean_sq * w + bsq * (1.0 - w),
        debias=st.debias * w + (1.0 - w),
    )


def normalize(st: ValueNormState, x: jax.Array) -> jax.Array:
    mean, var = _stats(st)
    return ((x - mean) / jnp.sqrt(var)).astype(x.dtype)


def denormalize(st: ValueNormState, x: jax.Array) -> jax.Array:
    mean, var = _stats(st)
    return (x * jnp.sqrt(var) + mean).astype(x.dtype)
