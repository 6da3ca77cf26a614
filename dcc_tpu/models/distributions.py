"""Functional action distributions.

Replaces the reference's torch.distributions wrappers
(``algos/algo_utils/distributions.py``) with pure functions over explicit
parameter arrays — no distribution objects, everything fuses under jit.

Semantics parity:

* DiagGaussian with *state-independent* log-std (the reference's ``AddBias``
  trick, ``distributions.py:72-92,108-119``): mean from a Dense head, log_std
  a free parameter initialized to zero.
* ``log_probs`` sums over action dims with keepdim (``distributions.py:34-35``)
* entropy per-sample is summed over action dims; the trainer reduces it with
  an active-mask-weighted mean (``act.py:174-181``).
* Categorical: sampling/log-prob over logits with available-action masking
  (``distributions.py:15-29,58-70``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Diagonal Gaussian
# ---------------------------------------------------------------------------

def normal_sample(key: jax.Array, mean: jax.Array, log_std: jax.Array) -> jax.Array:
    return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape, mean.dtype)


def normal_log_prob(mean: jax.Array, log_std: jax.Array, action: jax.Array) -> jax.Array:
    """Sum over action dims, keepdim (FixedNormal.log_probs)."""
    var = jnp.exp(2.0 * log_std)
    lp = -((action - mean) ** 2) / (2.0 * var) - log_std - _LOG_SQRT_2PI
    return jnp.sum(lp, axis=-1, keepdims=True)


def normal_entropy(log_std: jax.Array, mean: jax.Array) -> jax.Array:
    """Per-dim entropy 0.5 + 0.5*log(2pi) + log_std, broadcast to mean's
    batch shape, NOT summed (matches torch Normal.entropy -> act.py applies
    the mask then sums/means)."""
    ent = 0.5 + _LOG_SQRT_2PI + log_std
    return jnp.broadcast_to(ent, mean.shape)


def normal_mode(mean: jax.Array) -> jax.Array:
    return mean


# ---------------------------------------------------------------------------
# Categorical
# ---------------------------------------------------------------------------

def categorical_mask(logits: jax.Array, available: Optional[jax.Array]) -> jax.Array:
    if available is None:
        return logits
    return jnp.where(available > 0, logits, jnp.asarray(-1e10, logits.dtype))


def categorical_sample(key: jax.Array, logits: jax.Array) -> jax.Array:
    """Returns (..., 1) int actions (FixedCategorical.sample unsqueezes)."""
    return jax.random.categorical(key, logits, axis=-1)[..., None]


def categorical_log_prob(logits: jax.Array, action: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, action.astype(jnp.int32), axis=-1)


def categorical_entropy(logits: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def categorical_mode(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, axis=-1)[..., None]
