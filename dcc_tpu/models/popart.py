"""Functional PopArt value head state (off by default, parity with
``algos/algo_utils/popart.py``; ``use_popart: false`` in mappo.yaml:21).

PopArt keeps running output statistics and rescales the value head's weight
and bias whenever the statistics move, preserving the head's unnormalized
outputs. In JAX the head params live in the critic param pytree, so the
update returns both the new stats and the rescaled (kernel, bias).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PopArtState(NamedTuple):
    mean: jax.Array  # (out,)
    mean_sq: jax.Array  # (out,)
    debias: jax.Array  # ()
    stddev: jax.Array  # (out,)
    beta: jax.Array = jnp.asarray(0.99999, jnp.float32)
    epsilon: jax.Array = jnp.asarray(1e-5, jnp.float32)


def init(out_shape: int = 1, dtype=jnp.float32, beta: float = 0.99999) -> PopArtState:
    return PopArtState(
        mean=jnp.zeros((out_shape,), dtype),
        mean_sq=jnp.zeros((out_shape,), dtype),
        debias=jnp.zeros((), dtype),
        stddev=jnp.ones((out_shape,), dtype),
        beta=jnp.asarray(beta, dtype),
        epsilon=jnp.asarray(1e-5, dtype),
    )


def update(
    st: PopArtState, kernel: jax.Array, bias: jax.Array, batch: jax.Array
) -> Tuple[PopArtState, jax.Array, jax.Array]:
    """EMA-update stats on ``batch`` (..., out) and rescale the head
    (popart.py:50-66: new_std from raw EMA stats, clamped at 1e-4;
    w *= old_std/new_std; b = (old_std*b + old_mean - new_mean)/new_std)."""
    old_mean, old_std = st.mean, st.stddev
    flat = batch.reshape(-1, batch.shape[-1]).astype(st.mean.dtype)
    bm = flat.mean(axis=0)
    bsq = (flat**2).mean(axis=0)
    w = st.beta
    mean = st.mean * w + bm * (1.0 - w)
    mean_sq = st.mean_sq * w + bsq * (1.0 - w)
    debias = st.debias * w + (1.0 - w)
    stddev = jnp.clip(jnp.sqrt(mean_sq - mean**2), min=1e-4)
    new_kernel = kernel * (old_std / stddev)
    new_bias = (old_std * bias + old_mean - mean) / stddev
    return st._replace(mean=mean, mean_sq=mean_sq, debias=debias, stddev=stddev), new_kernel, new_bias


def _debiased(st: PopArtState):
    debias = jnp.clip(st.debias, min=st.epsilon)
    mean = st.mean / debias
    var = jnp.clip(st.mean_sq / debias - mean**2, min=1e-2)
    return mean, var


def normalize(st: PopArtState, x: jax.Array) -> jax.Array:
    mean, var = _debiased(st)
    return ((x - mean) / jnp.sqrt(var)).astype(x.dtype)


def denormalize(st: PopArtState, x: jax.Array) -> jax.Array:
    mean, var = _debiased(st)
    return (x * jnp.sqrt(var) + mean).astype(x.dtype)
