"""`spread` scenario: the classic MPE cooperative navigation task
(simple_spread), TPU-native.

The reference tree ships only the `coverage` scenario but inherits the
whole MPE scenario framework (``envs/mpe/multiagent/scenarios/__init__.py``
loads scenarios by name; ``environment.py`` is scenario-agnostic). This
module is the proof that dcc_tpu's scenario registry
(:func:`dcc_tpu.envs.register_scenario`) is equally generic: a second,
structurally different scenario (own config/obs/reward) reachable from the
YAML ``scenario_name`` key with no changes to the algorithms.

Task: N agents spread to occupy M (=N by default) landmarks. Reward is the
negative sum over landmarks of the distance to the closest agent, minus a
collision penalty, summed over agents like the reference's shared-reward
pipeline (``environment.py:105-108``). Episodes end only by time limit or
leaving the hard bound (like coverage's out-of-bounds rule,
``scenarios/coverage.py:112-117``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .coverage import EnvState, StepOut


class SpreadConfig(NamedTuple):
    """Static config for the spread scenario (double-integrator physics
    constants shared with coverage: ``core.py:105-110``)."""

    n_agents: int = 4
    n_landmarks: int = 4
    max_ep_len: int = 150
    dt: float = 0.1
    damping: float = 0.25
    max_speed: float = 0.5
    sensitivity: float = 5.0
    agent_size: float = 0.15
    occupy_radius: float = 0.1  # landmark counts as occupied within this
    collision_penalty: float = 1.0
    soft_bound: float = 1.0
    hard_bound: float = 1.5
    discrete_actions: bool = False
    time_limit: bool = True

    # MAPPO/MADDPG-facing interface (same contract as coverage.EnvConfig)
    @property
    def n_pois(self) -> int:  # registry-generic alias
        return self.n_landmarks

    @property
    def obs_dim(self) -> int:
        # [vel(2), pos(2), rel-landmark(2M), rel-agent(2(N-1))]
        return 4 + 2 * self.n_landmarks + 2 * (self.n_agents - 1)

    @property
    def share_obs_dim(self) -> int:
        return self.n_agents * self.obs_dim

    @property
    def action_dim(self) -> int:
        return 5 if self.discrete_actions else 2


def reset(cfg: SpreadConfig, key: jax.Array, dtype=jnp.float32) -> EnvState:
    """Agents and landmarks uniform in [-1, 1]^2 (MPE simple_spread reset)."""
    n, m = cfg.n_agents, cfg.n_landmarks
    key, k_a, k_l = jax.random.split(key, 3)
    return EnvState(
        pos=jax.random.uniform(k_a, (n, 2), dtype, -1.0, 1.0),
        vel=jnp.zeros((n, 2), dtype),
        poi_pos=jax.random.uniform(k_l, (m, 2), dtype, -1.0, 1.0),
        poi_vel=jnp.zeros((m, 2), dtype),
        energy=jnp.zeros((m,), dtype),
        poi_done=jnp.zeros((m,), bool),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def observation(cfg: SpreadConfig, state: EnvState) -> jax.Array:
    """(N, obs_dim): own vel, own pos, landmark offsets, other-agent
    offsets (simple_spread's observation layout)."""
    n = cfg.n_agents
    rel_l = state.poi_pos[None, :, :] - state.pos[:, None, :]  # (N, M, 2)
    rel_a = state.pos[None, :, :] - state.pos[:, None, :]  # (N, N, 2)
    others = jnp.stack(
        [jnp.delete(rel_a[i], i, axis=0, assume_unique_indices=True) for i in range(n)]
    )  # (N, N-1, 2)
    return jnp.concatenate(
        [
            state.vel,
            state.pos,
            rel_l.reshape(n, -1),
            others.reshape(n, -1),
        ],
        axis=-1,
    )


def step(cfg: SpreadConfig, state: EnvState, action: jax.Array) -> Tuple[EnvState, StepOut]:
    n, m = cfg.n_agents, cfg.n_landmarks
    dtype = state.pos.dtype
    if cfg.discrete_actions:
        table = jnp.asarray(
            [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]], dtype
        )
        action = table[jnp.asarray(action, jnp.int32).reshape(n)]
    force = jnp.asarray(action, dtype) * cfg.sensitivity
    vel = state.vel * (1.0 - cfg.damping) + force * cfg.dt
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1, keepdims=True))
    vel = jnp.where(
        speed > cfg.max_speed, vel / jnp.maximum(speed, 1e-20) * cfg.max_speed, vel
    )
    pos = state.pos + vel * cfg.dt

    d_al = jnp.sqrt(
        jnp.sum((pos[:, None, :] - state.poi_pos[None, :, :]) ** 2, axis=-1)
    )  # (N, M)
    min_d = jnp.min(d_al, axis=0)  # (M,)
    occupied = min_d < cfg.occupy_radius
    # collisions between agent pairs (MPE is_collision: dist < 2*size)
    delta = pos[:, None, :] - pos[None, :, :]
    pd = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    n_coll = jnp.sum(jnp.tril(pd < 2.0 * cfg.agent_size, k=-1).astype(dtype))
    over = jnp.maximum(jnp.abs(pos) - cfg.soft_bound, 0.0)
    out_hard = jnp.any(jnp.abs(pos) > cfg.hard_bound, axis=1)
    per_agent = (
        -jnp.sum(min_d)
        - cfg.collision_penalty * n_coll
        - 100.0 * (jnp.sum(over) + jnp.sum(out_hard.astype(dtype)))
    )
    reward = n * per_agent  # shared-reward x N sum (environment.py:105-108)

    done = jnp.any(out_hard)
    t_next = state.t + 1
    truncated = (
        (t_next >= cfg.max_ep_len) & ~done
        if cfg.time_limit
        else jnp.zeros((), bool)
    )
    new_state = EnvState(
        pos=pos,
        vel=vel,
        poi_pos=state.poi_pos,
        poi_vel=state.poi_vel,
        energy=state.energy + occupied.astype(dtype),
        poi_done=occupied,
        t=t_next,
        key=state.key,
    )
    return new_state, StepOut(
        obs=observation(cfg, new_state),
        reward=reward,
        done=done,
        coverage_rate=jnp.mean(occupied.astype(dtype)),
        truncated=truncated,
    )


def config_from_yaml(cfg: dict) -> SpreadConfig:
    """Merged-yaml dict -> SpreadConfig (the spread analog of the loader's
    coverage mapping; reference yaml key names where they overlap)."""
    return SpreadConfig(
        n_agents=int(cfg.get("num_agents", 4)),
        n_landmarks=int(cfg.get("num_landmarks", cfg.get("num_pois", 4))),
        max_ep_len=int(cfg.get("max_ep_len", 150)),
        collision_penalty=float(cfg.get("collision_penalty", 1.0)),
        occupy_radius=float(cfg.get("occupy_radius", 0.1)),
        discrete_actions=bool(cfg.get("discrete_actions", False)),
        time_limit=bool(cfg.get("time_limit", True)),
    )
