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


# ---------------------------------------------------------------------------
# Bernoulli (MultiBinary actions)
# ---------------------------------------------------------------------------
# NB: the reference's FixedBernoulli.log_probs would crash if ever reached
# (`super.log_prob` missing parens, distributions.py:47 — SURVEY.md quirk #5);
# this is the corrected semantics its code intends.

def bernoulli_sample(key: jax.Array, logits: jax.Array) -> jax.Array:
    p = jax.nn.sigmoid(logits)
    return (jax.random.uniform(key, logits.shape, logits.dtype) < p).astype(
        logits.dtype
    )


def bernoulli_log_prob(logits: jax.Array, action: jax.Array) -> jax.Array:
    """Sum over dims, keepdim (FixedBernoulli.log_probs intent)."""
    lp = action * jax.nn.log_sigmoid(logits) + (1.0 - action) * jax.nn.log_sigmoid(
        -logits
    )
    return jnp.sum(lp, axis=-1, keepdims=True)


def bernoulli_entropy(logits: jax.Array) -> jax.Array:
    """Per-dim entropy (..., n), summed/meaned by the caller."""
    p = jax.nn.sigmoid(logits)
    return -(
        p * jax.nn.log_sigmoid(logits) + (1.0 - p) * jax.nn.log_sigmoid(-logits)
    )


def bernoulli_mode(logits: jax.Array) -> jax.Array:
    return (logits > 0).astype(logits.dtype)


# ---------------------------------------------------------------------------
# ACTLayer-style head dispatch (act.py:43-94 forward, :118-194 evaluate)
# ---------------------------------------------------------------------------
# `out` is the Actor head output for the given kind:
#   gaussian       -> (mean, log_std)
#   categorical    -> logits
#   multi_discrete -> tuple of per-branch logits
#   multi_binary   -> logits (..., n)
#   mixed          -> ((mean, log_std), disc_logits)
# Conventions: sample_head returns (action, log_probs); evaluate_head
# returns (log_probs, per_sample_entropy) where the caller reduces entropy
# as ent.sum(-1).mean() — entropies are pre-scaled so that reduction
# reproduces the reference's (sometimes quirky) branch weightings.


def sample_head(key, kind: str, out, deterministic: bool = False):
    if kind == "gaussian":
        mean, log_std = out
        action = normal_mode(mean) if deterministic else normal_sample(key, mean, log_std)
        return action, normal_log_prob(mean, log_std, action)
    if kind == "categorical":
        logits = out
        action = (
            categorical_mode(logits) if deterministic else categorical_sample(key, logits)
        )
        return action, categorical_log_prob(logits, action)
    if kind == "multi_discrete":
        # per-branch actions concatenated; per-branch log-probs kept as
        # separate columns (act.py:68-79: cat, not sum)
        actions, lps = [], []
        for i, logits in enumerate(out):
            k = jax.random.fold_in(key, i)
            a = categorical_mode(logits) if deterministic else categorical_sample(k, logits)
            actions.append(a)
            lps.append(categorical_log_prob(logits, a))
        return (
            jnp.concatenate(actions, axis=-1).astype(jnp.float32),
            jnp.concatenate(lps, axis=-1),
        )
    if kind == "multi_binary":
        logits = out
        action = bernoulli_mode(logits) if deterministic else bernoulli_sample(key, logits)
        return action, bernoulli_log_prob(logits, action)
    if kind == "mixed":
        (mean, log_std), logits = out
        k_c, k_d = jax.random.split(key)
        a_c = normal_mode(mean) if deterministic else normal_sample(k_c, mean, log_std)
        a_d = categorical_mode(logits) if deterministic else categorical_sample(k_d, logits)
        # actions cat as float; log-probs cat then summed keepdim
        # (act.py:55-66)
        lp = normal_log_prob(mean, log_std, a_c) + categorical_log_prob(logits, a_d)
        return jnp.concatenate([a_c, a_d.astype(a_c.dtype)], axis=-1), lp
    raise ValueError(f"unknown head kind {kind!r}")


def evaluate_head(kind: str, out, action):
    if kind == "gaussian":
        mean, log_std = out
        return (
            normal_log_prob(mean, log_std, action),
            normal_entropy(log_std, mean),
        )
    if kind == "categorical":
        logits = out
        return (
            categorical_log_prob(logits, action),
            categorical_entropy(logits)[..., None],
        )
    if kind == "multi_discrete":
        nb = len(out)
        lps, ents = [], []
        for i, logits in enumerate(out):
            a = action[..., i : i + 1]
            lps.append(categorical_log_prob(logits, a))
            # reference reduces entropy as the MEAN over branches
            # (act.py:151-164: torch.tensor(list).mean()); pre-divide by the
            # branch count so the caller's sum(-1) reproduces it
            ents.append(categorical_entropy(logits)[..., None] / nb)
        return jnp.concatenate(lps, axis=-1), jnp.concatenate(ents, axis=-1)
    if kind == "multi_binary":
        logits = out
        return bernoulli_log_prob(logits, action), bernoulli_entropy(logits)
    if kind == "mixed":
        (mean, log_std), logits = out
        cont_dim = mean.shape[-1]
        a_c = action[..., :cont_dim]
        a_d = action[..., cont_dim:]
        lp = normal_log_prob(mean, log_std, a_c) + categorical_log_prob(logits, a_d)
        # the reference's mixed entropy weighting e_gauss/2.0 + e_cat/0.98
        # (act.py:149 — flagged "doesn't make sense" in its own comment, but
        # replicated for parity); its gaussian term is a mean over dims
        ent = (
            normal_entropy(log_std, mean).mean(axis=-1, keepdims=True) / 2.0
            + categorical_entropy(logits)[..., None] / 0.98
        )
        return lp, ent
    raise ValueError(f"unknown head kind {kind!r}")
