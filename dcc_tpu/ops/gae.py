"""Generalized Advantage Estimation as a reverse-time ``lax.scan``.

Parity target: ``buffer/shared_buffer.py:199-217`` (the
``use_proper_time_limits=False`` branch used by the default config) —

    delta_t = r_t + gamma * V(s_{t+1}) * mask_{t+1} - V(s_t)
    gae_t   = delta_t + gamma * lambda * mask_{t+1} * gae_{t+1}
    ret_t   = gae_t + V(s_t)

where V values are *denormalized* by the value normalizer when one is in use
(the caller passes denormalized values). Also provides the
discounted-return-only path (``use_gae=False``, shared_buffer.py:214-217) and
the proper-time-limits variant with bad_masks (shared_buffer.py:165-198).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,  # (T, ..., 1)
    values: jax.Array,  # (T+1, ..., 1) denormalized
    masks: jax.Array,  # (T+1, ..., 1)  mask[t+1]=0 if episode ended at step t
    gamma: float,
    gae_lambda: float,
    bad_masks: Optional[jax.Array] = None,  # (T+1, ..., 1)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (advantages, returns), each (T, ..., 1).

    advantages are raw GAE values (returns - values[:-1]).
    """
    v_next = values[1:]
    v_curr = values[:-1]
    m_next = masks[1:]

    def body(gae, inp):
        if bad_masks is None:
            r, vn, vc, m = inp
            delta = r + gamma * vn * m - vc
            gae = delta + gamma * gae_lambda * m * gae
        else:
            r, vn, vc, m, bm = inp
            delta = r + gamma * vn * m - vc
            gae = (delta + gamma * gae_lambda * m * gae) * bm
        return gae, gae

    xs = (rewards, v_next, v_curr, m_next)
    if bad_masks is not None:
        xs = xs + (bad_masks[1:],)
    # carry shape = broadcast of rewards/values/masks (values may carry a
    # per-agent axis under separated policies)
    init = jnp.zeros_like(rewards[0] + v_curr[0] * m_next[0])
    _, adv = jax.lax.scan(body, init, xs, reverse=True)
    return adv, adv + v_curr


def discounted_returns(
    rewards: jax.Array,
    next_value: jax.Array,
    masks: jax.Array,
    gamma: float,
    bad_masks: Optional[jax.Array] = None,  # (T+1, ..., 1)
    values: Optional[jax.Array] = None,  # (T, ..., 1) denormalized, required w/ bad_masks
) -> jax.Array:
    """``use_gae=False`` path: ret_t = r_t + gamma * mask_{t+1} * ret_{t+1}
    (shared_buffer.py:214-217). With bad_masks (use_proper_time_limits,
    shared_buffer.py:186-196): ret_t = bad_{t+1} * (gamma * mask_{t+1} *
    ret_{t+1} + r_t) + (1 - bad_{t+1}) * V(s_t) — a truncated step's return
    falls back to the (denormalized) value estimate."""
    if bad_masks is None:

        def body(ret, inp):
            r, m = inp
            ret = r + gamma * m * ret
            return ret, ret

        _, rets = jax.lax.scan(body, next_value, (rewards, masks[1:]), reverse=True)
        return rets

    if values is None:
        raise ValueError("values required when bad_masks is given")

    def body(ret, inp):
        r, m, bm, v = inp
        ret = bm * (gamma * m * ret + r) + (1.0 - bm) * v
        return ret, ret

    _, rets = jax.lax.scan(
        body, next_value, (rewards, masks[1:], bad_masks[1:], values), reverse=True
    )
    return rets
