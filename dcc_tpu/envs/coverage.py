"""Pure-JAX multi-UAV dynamic coverage environment.

TPU-native re-implementation of the reference coverage world. Instead of one
Python object-graph env per OS process stepped over pipes (reference:
``envs/wrappers.py:133-201``), the whole environment is a pair of pure
functions ``reset`` / ``step`` over an explicit :class:`EnvState` pytree,
designed to be ``jax.vmap``-batched over thousands of env instances and
``lax.scan``-stepped inside one jitted program.

Behavioral parity targets (all cited against ``/root/reference/uav_dcc_control``):

* physics step order: connectivity update -> action force -> optional
  connectivity pull force -> semi-implicit Euler with damping and speed clamp
  -> PoI energy accumulation (``CoverageWorld.py:57-68``)
* action-to-force gain ("sensitivity") of 5.0 (``environment.py:186-190``)
* adjacency / strong-connectivity via sums of adjacency-matrix powers
  (``CoverageWorld.py:70-93``), including the reference's quirk of chaining the
  *unscaled* adjacency into the scaled connectivity indicator
  (``CoverageWorld.py:90``) unless ``fix_scaled_connectivity=True``
* the two-case rule-based connectivity pull force (``CoverageWorld.py:100-127``)
  expressed as fully masked array math (no data-dependent Python branching)
* softplus-shaped pull-force magnitude (``CoverageWorld.py:129-140``)
* PoI energy +1 per covering UAV per step, done at ``m_energy``, one-shot
  ``just`` flags, coverage rate (``CoverageWorld.py:157-174``)
* reward = -sum of min-dist to each undone PoI + one-shot cover bonus + task
  -done bonus - out-of-bounds penalties (``scenarios/coverage.py:80-97``),
  with the reference's shared-reward summing semantics: every term is counted
  once per agent by ``environment.py:105-108`` *except* the cover bonus, which
  the first agent's reward callback consumes via the ``just`` flag mutation
  (``scenarios/coverage.py:87-89``) and is therefore counted exactly once
* observation layout per agent: [vel(2), pos(2), relative positions of the
  other agents (2*(N-1)), then per PoI (rel(2), energy, m_energy, done)]
  (``scenarios/coverage.py:99-110``)
* episode termination when any agent coordinate exceeds 1.5 or all PoIs are
  covered (``scenarios/coverage.py:112-117``)
* deterministic reset: agents at the origin, PoIs from the frozen 1000x2 bank
  (``scenarios/coverage.py:64-78``, ``pos_pois.npy`` shipped verbatim as a
  data asset)

Extensions beyond the reference (all off by default): configurable N/M that
actually take effect (the reference hardcodes 4/20, ``scenarios/coverage.py:40-41``),
randomized PoI layouts, moving PoIs, and pairwise collision penalties.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets")

# Sentinel distance used by the reference for "self" / masked pairs
# (CoverageWorld.py:11, :81, :120).
_FAR = 1e5


class EnvConfig(NamedTuple):
    """Static environment configuration.

    A hashable NamedTuple of Python scalars so the whole config can be a jit
    static argument; array-valued inputs (the PoI bank) are passed separately.
    Defaults mirror ``config/env_config/dcc.yaml:5-12`` and
    ``scenarios/coverage.py:22-31`` / ``core.py:105-110``.
    """

    n_agents: int = 4
    n_pois: int = 20
    max_ep_len: int = 150
    r_cover: float = 0.2
    r_comm: float = 0.4
    comm_r_scale: float = 0.95
    comm_force_scale: float = 0.0
    dt: float = 0.1
    damping: float = 0.25
    max_speed: float = 0.5
    sensitivity: float = 5.0
    contact_force: float = 1e2
    contact_margin: float = 1e-3
    m_energy: float = 5.0
    rew_cover: float = 75.0
    rew_done: float = 1500.0
    rew_out: float = -100.0
    soft_bound: float = 1.0
    hard_bound: float = 1.5
    bb: float = 1.2
    size: float = 0.02
    # discrete_actions mirrors the reference's discrete_action_space mode
    # (environment.py:48-52: Discrete(2*dim_p+1); decode at :171-185):
    # actions are indices {0: noop, 1: -x, 2: +x, 3: -y, 4: +y}.
    discrete_actions: bool = False
    # action_mode generalizes the action space across every ACTLayer branch
    # (act.py:19-41): "" derives continuous/discrete from discrete_actions;
    # "multi_discrete" = per-axis {-1,0,+1} forces (MultiDiscrete(3,3));
    # "multi_binary" = 4 thruster bits (+x,-x,+y,-y); "mixed" = Box(2)
    # force direction + Discrete(3) throttle scale {0.5, 1.0, 1.5}.
    action_mode: str = ""
    # --- extensions beyond the reference (off by default) ---
    randomize_pois: bool = False
    poi_speed: float = 0.0
    collision_penalty: float = 0.0
    collision_radius: float = 0.08
    fix_scaled_connectivity: bool = False
    # Compensated-precision pull force: evaluate the connectivity-force
    # distance/softplus-argument chain in double-float (~2^-48) while the
    # env state stays float32. TPU-runnable stand-in for the reference's
    # f64 numpy physics on the one path whose error is amplified by
    # 1/contact_margin = 1e3 (CoverageWorld.py:129-140); see ops/df64.py.
    compensated_forces: bool = False
    # Truncate episodes at max_ep_len (a gym TimeLimit analog; the reference
    # env never truncates — its episodes only end on the scenario done,
    # scenarios/coverage.py:112-117). Truncations are reported separately
    # from real dones so `use_proper_time_limits` GAE (bad_masks,
    # shared_buffer.py:165-198) can stop credit across the boundary.
    time_limit: bool = False

    @property
    def obs_dim(self) -> int:
        return 4 + 2 * (self.n_agents - 1) + 5 * self.n_pois

    @property
    def share_obs_dim(self) -> int:
        return self.n_agents * self.obs_dim

    @property
    def resolved_action_mode(self) -> str:
        if self.action_mode:
            return self.action_mode
        return "discrete" if self.discrete_actions else "continuous"

    @property
    def action_dim(self) -> int:
        """Width the policy head needs for single-head modes (continuous:
        force dims; discrete: category count; multi_binary: bit count) and
        the env-facing action width otherwise."""
        return {
            "continuous": 2,
            "discrete": 5,
            "multi_discrete": 2,  # two branch indices
            "multi_binary": 4,
            "mixed": 3,  # 2 continuous + 1 discrete index
        }[self.resolved_action_mode]

    @property
    def action_head_kind(self) -> str:
        """ACTLayer dispatch kind (models/actor_critic.Actor.head_kind)."""
        return {
            "continuous": "gaussian",
            "discrete": "categorical",
            "multi_discrete": "multi_discrete",
            "multi_binary": "multi_binary",
            "mixed": "mixed",
        }[self.resolved_action_mode]

    @property
    def action_head_dims(self) -> tuple:
        mode = self.resolved_action_mode
        if mode == "multi_discrete":
            return (3, 3)  # {-1, 0, +1} per axis
        if mode == "mixed":
            return (2, 3)  # Box(2) + Discrete(3)
        return ()

    @property
    def effective_contact_force(self) -> float:
        # CoverageWorld.py:16: contact_force *= comm_force_scale
        return self.contact_force * self.comm_force_scale


@struct.dataclass
class EnvState:
    """Dynamic per-env state pytree (replaces the reference's object graph)."""

    pos: jax.Array  # (N, 2) agent positions
    vel: jax.Array  # (N, 2) agent velocities
    poi_pos: jax.Array  # (M, 2)
    poi_vel: jax.Array  # (M, 2) zero unless poi_speed > 0
    energy: jax.Array  # (M,)
    poi_done: jax.Array  # (M,) bool
    t: jax.Array  # () int32 steps since reset
    key: jax.Array  # PRNG key for randomized resets / PoI motion


class StepOut(NamedTuple):
    obs: jax.Array  # (N, obs_dim)
    reward: jax.Array  # () shared team reward (every agent receives it)
    done: jax.Array  # () bool episode termination (real done, not truncation)
    coverage_rate: jax.Array  # ()
    truncated: jax.Array = jnp.zeros((), bool)  # () time-limit truncation


def default_poi_bank() -> np.ndarray:
    """The frozen 1000x2 U(-1,1) PoI position bank shipped as a data asset
    (reference: ``scenarios/pos_pois.npy``, loaded at ``coverage.py:15-17``)."""
    return np.load(os.path.join(_ASSET_DIR, "pos_pois.npy"))


@functools.partial(jax.jit, static_argnums=(0, 3))
def reset(
    cfg: EnvConfig,
    key: jax.Array,
    poi_bank: Optional[jax.Array] = None,
    dtype: jnp.dtype = jnp.float32,
) -> EnvState:
    """Reset one env instance (reference ``scenarios/coverage.py:64-78``).

    Agents start at the origin with zero velocity; PoIs are rows [0:M] of the
    frozen bank (deterministic) or drawn U(-1,1) when ``cfg.randomize_pois``.
    """
    n, m = cfg.n_agents, cfg.n_pois
    key, k_poi, k_vel = jax.random.split(key, 3)
    if poi_bank is None:
        poi_bank = jnp.asarray(default_poi_bank(), dtype=dtype)
    if cfg.randomize_pois:
        poi_pos = jax.random.uniform(k_poi, (m, 2), dtype=dtype, minval=-1.0, maxval=1.0)
    else:
        poi_pos = jnp.asarray(poi_bank[:m], dtype=dtype)
    if cfg.poi_speed > 0.0:
        theta = jax.random.uniform(k_vel, (m,), dtype=dtype, minval=0.0, maxval=2.0 * np.pi)
        poi_vel = cfg.poi_speed * jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
    else:
        poi_vel = jnp.zeros((m, 2), dtype=dtype)
    return EnvState(
        pos=jnp.zeros((n, 2), dtype=dtype),
        vel=jnp.zeros((n, 2), dtype=dtype),
        poi_pos=poi_pos,
        poi_vel=poi_vel,
        energy=jnp.zeros((m,), dtype=dtype),
        poi_done=jnp.zeros((m,), dtype=bool),
        t=jnp.zeros((), dtype=jnp.int32),
        key=key,
    )


def _pairwise_dist(pos: jax.Array) -> jax.Array:
    """(N, N) pairwise distances with the diagonal forced to _FAR
    (reference ``CoverageWorld.py:74-81``)."""
    delta = pos[:, None, :] - pos[None, :, :]
    dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    eye = jnp.eye(pos.shape[0], dtype=bool)
    return jnp.where(eye, jnp.asarray(_FAR, dist.dtype), dist)


def connectivity(cfg: EnvConfig, pos: jax.Array):
    """Adjacency matrices and strong-connectivity indicators.

    Mirrors ``CoverageWorld.update_connect`` (``CoverageWorld.py:70-93``):
    ``adj`` uses threshold 2*r_comm, ``adj_`` uses comm_r_scale * 2*r_comm,
    both with zero diagonal; strong connectivity is decided by whether
    ``sum_k chain_k`` is everywhere positive. The reference chains the
    *unscaled* adjacency into the scaled indicator (``CoverageWorld.py:90``,
    quirk #3 in SURVEY.md) -- replicated unless ``fix_scaled_connectivity``.
    """
    n = cfg.n_agents
    dtype = pos.dtype
    delta = pos[:, None, :] - pos[None, :, :]
    raw = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    eye = jnp.eye(n, dtype=bool)
    dist = jnp.where(eye, jnp.asarray(_FAR, dtype), raw)
    thresh = cfg.r_comm * 2.0
    adj = jnp.where(eye, 0.0, (raw < thresh).astype(dtype))
    adj_ = jnp.where(eye, 0.0, (raw < cfg.comm_r_scale * thresh).astype(dtype))

    ident = jnp.eye(n, dtype=dtype)

    def body(carry, _):
        chain, chain_s = carry
        chain = chain @ adj
        if cfg.fix_scaled_connectivity:
            chain_s = chain_s @ adj_
        else:
            # Reference quirk: connect_mat_ terms are adj^k @ adj_
            # (CoverageWorld.py:90 uses connect_mat[-1], the just-appended
            # unscaled power).
            chain_s = chain @ adj_
        return (chain, chain_s), (chain, chain_s)

    (_, _), (chains, chains_s) = jax.lax.scan(
        body, (ident, ident), None, length=n - 1
    )
    acc = ident + jnp.sum(chains, axis=0)
    acc_s = ident + jnp.sum(chains_s, axis=0)
    connect = jnp.all(acc > 0)
    connect_s = jnp.all(acc_s > 0)
    return dist, adj, adj_, connect, connect_s


def _pull_force(cfg: EnvConfig, delta: jax.Array, dist: jax.Array) -> jax.Array:
    """Softplus-shaped pull force on agent a toward agent b
    (``CoverageWorld.get_connect_force``, ``CoverageWorld.py:129-140``).

    ``delta = pos_a - pos_b``; returns the force applied to *b* (+f); *a*
    receives -f.
    """
    dist_max = 2.0 * cfg.r_comm * cfg.comm_r_scale
    k = cfg.contact_margin
    penetration = jax.nn.softplus((dist - dist_max) / k) * k
    return cfg.effective_contact_force * delta / dist * penetration


def _pull_force_df64(cfg: EnvConfig, delta_pair) -> jax.Array:
    """Compensated-precision pull force (``compensated_forces=True``).

    Same math as :func:`_pull_force` (``CoverageWorld.py:129-140``) but the
    distance -> softplus-argument -> penetration chain runs in double-float
    (:mod:`dcc_tpu.ops.df64`), eliminating the f32 rounding of ``dist``
    that the 1/contact_margin = 1e3 argument scale amplifies. ``delta_pair``
    is a per-component exact (hi, lo) pair of ``pos_a - pos_b``; returns the
    f32 force applied to *b*.
    """
    from ..ops import df64

    dx, dy = (delta_pair[0][..., 0], delta_pair[1][..., 0]), (
        delta_pair[0][..., 1],
        delta_pair[1][..., 1],
    )
    d2 = df64.add(df64.mul(dx, dx), df64.mul(dy, dy))
    d = df64.sqrt(d2)
    dist_max = df64.from_f64(2.0 * cfg.r_comm * cfg.comm_r_scale)
    k = df64.from_f64(cfg.contact_margin)
    arg = df64.div(df64.add(d, (-dist_max[0], -dist_max[1])), k)
    # softplus in double-float to first order: sp(hi+lo) ~= sp(hi) + sig(hi)*lo
    sp = (jax.nn.softplus(arg[0]), jax.nn.sigmoid(arg[0]) * arg[1])
    pen = df64.mul(sp, k)
    cf = df64.from_f64(cfg.contact_force * cfg.comm_force_scale)
    factor = df64.mul(df64.div(pen, d), cf)
    fx = df64.mul(factor, dx)
    fy = df64.mul(factor, dy)
    return jnp.stack([df64.to_f32(fx), df64.to_f32(fy)], axis=-1)


def _connect_force(cfg: EnvConfig, pos, dist, adj_, connect_s) -> jax.Array:
    """Rule-based connectivity-preservation force as masked array math
    (``CoverageWorld.apply_connect_force``, ``CoverageWorld.py:100-127``).

    Case 1: every isolated agent (zero column-sum of adj_) is pulled toward
    its nearest agent (and vice versa). Case 2 (only when no agent is
    isolated): pull together the closest pair among pairs farther apart than
    the scaled comm radius. No force when already strongly connected.
    """
    n = cfg.n_agents
    dtype = pos.dtype
    isolated = jnp.sum(adj_, axis=0) == 0  # (N,) column sums, CoverageWorld.py:106
    any_isolated = jnp.any(isolated)

    # Scatter-free formulation: vmapped dynamic scatters/gathers lower poorly
    # on TPU (measured ~170x slower at 4096 envs), so partner selection is
    # expressed as one-hot contractions that stay on the VPU/MXU.

    # Compensated mode (compensated_forces=True, f32 state): the partner
    # SELECTION below stays f32 (discrete argmins), but the force magnitude
    # chain runs in double-float — see _pull_force_df64.
    comp = cfg.compensated_forces and dtype == jnp.float32

    # --- case 1: per-isolated-agent nearest-neighbor pull ---
    b1 = jnp.argmin(dist, axis=1)  # (N,) nearest agent per row
    hot_b1 = jnp.asarray(jax.nn.one_hot(b1, n, dtype=dtype))  # (N, N)
    delta1 = pos - hot_b1 @ pos  # pos_a - pos_b
    d1 = jnp.min(dist, axis=1, keepdims=True)
    if comp:
        from ..ops.df64 import two_diff

        # gather (exact), not one-hot matmul: TPU DEFAULT-precision matmuls
        # round f32 operands to bf16, which would break the error-free
        # two_diff transform below
        f1 = _pull_force_df64(cfg, two_diff(pos, pos[b1]))
    else:
        f1 = _pull_force(cfg, delta1, d1)  # (N, 2), force on b
    w1 = isolated.astype(dtype)[:, None]
    case1 = -f1 * w1 + hot_b1.T @ (f1 * w1)

    # --- case 2: global closest too-far pair ---
    # Reference mutates dist_mat in place (CoverageWorld.py:119-121);
    # replicated functionally.
    masked = jnp.where(dist < cfg.comm_r_scale * 2.0 * cfg.r_comm,
                       jnp.asarray(_FAR, dtype), dist)
    flat = jnp.argmin(masked.reshape(-1))
    hot_a2 = jax.nn.one_hot(flat // n, n, dtype=dtype)  # (N,)
    hot_b2 = jax.nn.one_hot(flat % n, n, dtype=dtype)
    delta2 = hot_a2 @ pos - hot_b2 @ pos
    d2 = jnp.min(masked)
    if comp:
        f2 = _pull_force_df64(
            cfg, two_diff(pos[flat // n], pos[flat % n])
        )
    else:
        f2 = _pull_force(cfg, delta2, d2)
    case2 = hot_b2[:, None] * f2 - hot_a2[:, None] * f2

    force = jnp.where(any_isolated, case1, case2)
    return jnp.where(connect_s, jnp.zeros_like(force), force)


def observation(cfg: EnvConfig, state: EnvState) -> jax.Array:
    """Per-agent observations, layout per ``scenarios/coverage.py:99-110``:
    [vel(2), pos(2), other-agent relative positions (2*(N-1)),
    per PoI: (rel(2), energy, m_energy, done)]."""
    n, m = cfg.n_agents, cfg.n_pois
    dtype = state.pos.dtype
    # Other-agent relative positions in original index order, skipping self.
    others_idx = np.array(
        [[j for j in range(n) if j != i] for i in range(n)], dtype=np.int32
    )  # (N, N-1) static
    rel_agents = state.pos[others_idx] - state.pos[:, None, :]  # (N, N-1, 2)
    rel_pois = state.poi_pos[None, :, :] - state.pos[:, None, :]  # (N, M, 2)
    poi_feat = jnp.concatenate(
        [
            state.energy[:, None],
            jnp.full((m, 1), cfg.m_energy, dtype=dtype),
            state.poi_done[:, None].astype(dtype),
        ],
        axis=-1,
    )  # (M, 3)
    poi_block = jnp.concatenate(
        [rel_pois, jnp.broadcast_to(poi_feat, (n, m, 3))], axis=-1
    ).reshape(n, 5 * m)
    return jnp.concatenate(
        [state.vel, state.pos, rel_agents.reshape(n, -1), poi_block], axis=-1
    )


@functools.partial(jax.jit, static_argnums=(0,))
def step(cfg: EnvConfig, state: EnvState, action: jax.Array) -> Tuple[EnvState, StepOut]:
    """Advance one env one step.

    ``action``: (N, 2) in [-1, 1] (Box action, ``environment.py:48-52``).
    Returns the new state and (obs, shared reward, done, coverage_rate)
    exactly per the reference step pipeline (``environment.py:86-110`` +
    ``CoverageWorld.py:57-68`` + ``scenarios/coverage.py:80-117``).
    """
    n, m = cfg.n_agents, cfg.n_pois
    dtype = state.pos.dtype
    mode = cfg.resolved_action_mode
    if mode == "discrete":
        # index -> unit force decode (environment.py:171-176)
        table = jnp.asarray(
            [[0.0, 0.0], [-1.0, 0.0], [1.0, 0.0], [0.0, -1.0], [0.0, 1.0]], dtype
        )
        action = table[jnp.asarray(action, jnp.int32).reshape(n)]
    elif mode == "multi_discrete":
        # per-axis branch index {0,1,2} -> force {-1,0,+1}
        action = jnp.asarray(action, dtype).reshape(n, 2) - 1.0
    elif mode == "multi_binary":
        # thruster bits (+x,-x,+y,-y) -> net axis forces
        b = jnp.asarray(action, dtype).reshape(n, 4)
        action = jnp.stack([b[:, 0] - b[:, 1], b[:, 2] - b[:, 3]], axis=-1)
    elif mode == "mixed":
        # Box(2) direction scaled by Discrete(3) throttle {0.5, 1.0, 1.5}
        a = jnp.asarray(action, dtype).reshape(n, 3)
        throttle = 0.5 * (jnp.round(a[:, 2:3]) + 1.0)
        action = a[:, :2] * throttle
    else:
        action = jnp.asarray(action, dtype)

    # -- pre-integration connectivity on OLD positions (CoverageWorld.py:58-59)
    force = action * cfg.sensitivity  # environment.py:186-190
    if cfg.effective_contact_force > 0.0:
        dist, adj, adj_, connect, connect_s = connectivity(cfg, state.pos)
        force = force + _connect_force(cfg, state.pos, dist, adj_, connect_s)

    # -- semi-implicit Euler with damping + speed clamp (CoverageWorld.py:142-155)
    vel = state.vel * (1.0 - cfg.damping) + force * cfg.dt  # mass = 1 (core.py:53)
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1, keepdims=True))
    vel = jnp.where(
        speed > cfg.max_speed, vel / jnp.maximum(speed, 1e-20) * cfg.max_speed, vel
    )
    pos = state.pos + vel * cfg.dt

    # -- optional moving PoIs (extension; off by default)
    if cfg.poi_speed > 0.0:
        poi_pos = state.poi_pos + state.poi_vel * cfg.dt
        # bounce off the +-1 box
        poi_vel = jnp.where(jnp.abs(poi_pos) > 1.0, -state.poi_vel, state.poi_vel)
        poi_pos = jnp.clip(poi_pos, -1.0, 1.0)
    else:
        poi_pos, poi_vel = state.poi_pos, state.poi_vel

    # -- PoI energy accumulation on NEW positions (CoverageWorld.py:157-174)
    d_ap = jnp.sqrt(
        jnp.sum((pos[:, None, :] - poi_pos[None, :, :]) ** 2, axis=-1)
    )  # (N, M)
    cover_cnt = jnp.sum((d_ap <= cfg.r_cover).astype(dtype), axis=0)  # (M,)
    energy = jnp.where(state.poi_done, state.energy, state.energy + cover_cnt)
    newly_done = (~state.poi_done) & (energy >= cfg.m_energy)
    poi_done = state.poi_done | newly_done
    coverage_rate = jnp.mean(poi_done.astype(dtype))

    # -- shared reward (scenarios/coverage.py:80-97 + environment.py:105-108)
    min_dist = jnp.min(d_ap, axis=0)  # (M,)
    r_track = -jnp.sum(jnp.where(poi_done, jnp.zeros((), dtype), min_dist))
    all_done = jnp.all(poi_done)
    r_done = jnp.asarray(cfg.rew_done, dtype) * all_done
    over = jnp.maximum(jnp.abs(pos) - cfg.soft_bound, 0.0)
    out_hard = jnp.any(jnp.abs(pos) > cfg.hard_bound, axis=1)
    r_oob = cfg.rew_out * (jnp.sum(over) + jnp.sum(out_hard.astype(dtype)))
    per_agent_part = r_track + r_done + r_oob
    if cfg.collision_penalty > 0.0:
        # extension: penalize overlapping agent pairs (off by default)
        pd = _pairwise_dist(pos)
        n_coll = jnp.sum(jnp.tril(pd < cfg.collision_radius, k=-1).astype(dtype))
        per_agent_part = per_agent_part - cfg.collision_penalty * n_coll
    # x N summing (environment.py:105-108); cover bonus counted ONCE due to
    # the reference's just-flag consumption (scenarios/coverage.py:87-89).
    reward = n * per_agent_part + cfg.rew_cover * jnp.sum(newly_done.astype(dtype))

    # -- termination (scenarios/coverage.py:112-117)
    done = jnp.any(out_hard) | all_done
    t_next = state.t + 1
    truncated = (
        (t_next >= cfg.max_ep_len) & ~done
        if cfg.time_limit
        else jnp.zeros((), bool)
    )

    new_state = EnvState(
        pos=pos,
        vel=vel,
        poi_pos=poi_pos,
        poi_vel=poi_vel,
        energy=energy,
        poi_done=poi_done,
        t=t_next,
        key=state.key,
    )
    obs = observation(cfg, new_state)
    return new_state, StepOut(
        obs=obs,
        reward=reward,
        done=done,
        coverage_rate=coverage_rate,
        truncated=truncated,
    )
