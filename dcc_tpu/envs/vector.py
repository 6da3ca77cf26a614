"""Batched vector environment with in-step auto-reset.

TPU-native replacement for the reference's process farm
(``envs/wrappers.py:133-201`` ``SubprocVecEnv`` / ``:204-261`` ``DummyVecEnv``):
E env instances live on-device as one stacked :class:`EnvState` pytree and are
stepped in lock-step by a single ``vmap``-batched pure function. The pipe
protocol's semantics are preserved:

* synchronous lock-step batch step over all envs
* per-env auto-reset when the episode is done, returning the *reset*
  observation together with the pre-reset reward/done/coverage_rate
  (``wrappers.py:104-109`` / ``:226-232``)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .coverage import EnvConfig, EnvState, StepOut, default_poi_bank, reset, step


def reset_batch(
    cfg: EnvConfig,
    key: jax.Array,
    n_envs: int,
    poi_bank: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> EnvState:
    """Reset E envs, each with its own PRNG key (reference seeds per-rank envs
    ``make_env.py:31-32``; here keys replace seeds)."""
    keys = jax.random.split(key, n_envs)
    if poi_bank is None:
        poi_bank = jnp.asarray(default_poi_bank(), dtype=dtype)
    return jax.vmap(lambda k: reset(cfg, k, poi_bank, dtype))(keys)


@functools.partial(jax.jit, static_argnums=(0,))
def step_batch(
    cfg: EnvConfig, states: EnvState, actions: jax.Array
) -> Tuple[EnvState, StepOut]:
    """Step E envs; auto-reset done envs in-place.

    ``actions``: (E, N, 2). Returns stacked ``StepOut`` with (E, ...) leaves;
    ``obs`` is the post-reset observation for done envs while reward / done /
    coverage_rate describe the pre-reset transition, mirroring the worker
    protocol (``wrappers.py:103-110``).
    """
    new_states, out = jax.vmap(step, in_axes=(None, 0, 0))(cfg, states, actions)

    # Auto-reset: rebuild fresh states for all envs (cheap: reset is trivial
    # math) and select per env. PoI bank rows [0:M] are recomputed from the
    # module asset captured at trace time.
    bank = jnp.asarray(default_poi_bank(), dtype=states.pos.dtype)
    fresh = jax.vmap(lambda k: reset(cfg, k, bank, states.pos.dtype))(new_states.key)
    # episode boundary = real done OR time-limit truncation (the gym
    # TimeLimit analog; truncated is constant-false without cfg.time_limit)
    boundary = out.done | out.truncated

    def pick(f, n):
        mask = boundary.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(mask, f, n)

    selected = jax.tree_util.tree_map(pick, fresh, new_states)
    obs_mask = boundary.reshape((-1,) + (1,) * (out.obs.ndim - 1))
    obs = jnp.where(obs_mask, jax.vmap(lambda s: _obs(cfg, s))(selected), out.obs)
    return selected, StepOut(
        obs=obs,
        reward=out.reward,
        done=out.done,
        coverage_rate=out.coverage_rate,
        truncated=out.truncated,
    )


def _obs(cfg: EnvConfig, state: EnvState) -> jax.Array:
    from .coverage import observation

    return observation(cfg, state)


def share_obs_from_obs(obs: jax.Array) -> jax.Array:
    """Centralized-critic observation: concat of all agents' obs per env,
    replicated per agent (``learner.py:218-224``). obs: (..., N, D) ->
    (..., N, N*D)."""
    *lead, n, d = obs.shape
    flat = obs.reshape(*lead, 1, n * d)
    return jnp.broadcast_to(flat, (*lead, n, n * d))


def make_vec_fns(scenario: str = "coverage"):
    """Build (reset_batch, step_batch) for a registered scenario — the
    scenario-generic analog of the module-level coverage pair above (the
    reference's ``MultiAgentEnv`` is likewise scenario-agnostic, its
    callbacks resolved by name at construction, ``uav_dcc.py:21-37``).

    Both closures have the same signatures and auto-reset semantics as the
    coverage-specific pair; ``step_batch`` resets on done OR truncation.
    """
    from . import get_scenario

    sc = get_scenario(scenario)
    reset_fn, step_fn, obs_fn = sc["reset"], sc["step"], sc["observation"]

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def reset_batch_fn(cfg, key, n_envs):
        keys = jax.random.split(key, n_envs)
        return jax.vmap(lambda k: reset_fn(cfg, k))(keys)

    @functools.partial(jax.jit, static_argnums=(0,))
    def step_batch_fn(cfg, states, actions):
        new_states, out = jax.vmap(step_fn, in_axes=(None, 0, 0))(
            cfg, states, actions
        )
        fresh = jax.vmap(lambda k: reset_fn(cfg, k))(new_states.key)
        boundary = out.done | out.truncated

        def pick(f, n):
            mask = boundary.reshape((-1,) + (1,) * (n.ndim - 1))
            return jnp.where(mask, f, n)

        selected = jax.tree_util.tree_map(pick, fresh, new_states)
        obs_mask = boundary.reshape((-1,) + (1,) * (out.obs.ndim - 1))
        obs = jnp.where(
            obs_mask, jax.vmap(lambda s: obs_fn(cfg, s))(selected), out.obs
        )
        return selected, StepOut(
            obs=obs,
            reward=out.reward,
            done=out.done,
            coverage_rate=out.coverage_rate,
            truncated=out.truncated,
        )

    return reset_batch_fn, step_batch_fn
