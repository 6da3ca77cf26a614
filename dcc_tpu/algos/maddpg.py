"""MADDPG: per-agent DDPG with centralized critics, TPU-native.

The reference ships a MADDPG implementation (``algos/maddpg.py``) that is
present but **unwired** — ``learner.py:48`` hardcodes shared MAPPO and no
training loop ever constructs it (SURVEY.md component #15). Here it is both
re-designed for TPU and actually runnable via the algo factory
(:mod:`dcc_tpu.algos.factory`).

Parity targets (against ``algos/maddpg.py`` / ``torchkit/networks.py``):

* per-agent tanh MLP actor over own obs (``maddpg.py:13-17,43-45``), rlkit
  Mlp family (GELU hidden, fan-in init — ``torchkit/networks.py:18-78``)
* per-agent centralized Q over concat(all obs, all actions)
  (``maddpg.py:47-49``)
* target networks with soft updates tau=0.01 (``maddpg.py:52-53,127-129``;
  ``utils/pytorch_utils.py:51-57``)
* TD target r_i + (1-done_i)*gamma*Q_target(next_obs_all, target_acts_all)
  (``maddpg.py:72-86``)
* policy loss -Q_i(obs_all, actions with own column replaced)
  (``maddpg.py:94-103``)
* OU exploration noise (``maddpg.py:163-179``), vectorized per env x agent

TPU-first re-design: all N agents' parameters are stacked on a leading agent
axis and every per-agent update is a ``vmap`` over that axis; the replay
buffer is a device-resident circular pytree; collection and updates run in
one jitted iteration.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..envs import EnvConfig, reset_batch, step_batch
from ..envs.coverage import observation
from ..models.rlkit_mlp import RlkitMlp
from ..parallel import mesh as _mesh


class MADDPGConfig(NamedTuple):
    """Defaults per ``algos/maddpg.py:20-27`` and ``config/expt.yaml:14``."""

    actor_lr: float = 5e-4
    critic_lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.01
    hidden_sizes: Tuple[int, ...] = (64,)
    buffer_capacity: int = 100_000
    batch_size: int = 256
    ou_mu: float = 0.0
    ou_theta: float = 0.15
    ou_sigma: float = 0.2
    n_envs: int = 16
    steps_per_iter: int = 150
    updates_per_iter: int = 50
    warmup_steps: int = 1000  # env-steps of random actions before updates
    # Learning stabilizers (the reference's MADDPG is unwired dead code, so
    # these have no parity constraint; they are what makes the shipped
    # algorithm actually train on this env):
    # - reward_scale: multiplies rewards in the TD target. The coverage
    #   env's team reward is ~-10^2..-10^3 per step (x N summing), putting
    #   raw Q targets at ~-10^4 and ill-conditioning the MSE critic; 0.01
    #   brings targets to O(10). Affects only critic conditioning — the
    #   greedy policy ordering is scale-invariant.
    # - action_reg: coefficient on mean(pre_tanh^2) in the actor loss — the
    #   MADDPG paper implementation's p_reg term. Without it the
    #   deterministic-policy gradient drives the tanh head to 100%
    #   saturation (measured here within ~3k updates) and learning stops.
    # - clip_grad: per-element gradient value clip (the reference's
    #   clip_grad_value ctor hook, algos/maddpg.py:27,108); 0 = off.
    reward_scale: float = 0.01
    action_reg: float = 1e-3
    clip_grad: float = 0.0


class ReplayBuffer(NamedTuple):
    """Device-resident circular transition store (capacity rows of joint
    transitions)."""

    obs: jax.Array  # (cap, N, D)
    actions: jax.Array  # (cap, N, act)
    rewards: jax.Array  # (cap, 1)  shared team reward
    next_obs: jax.Array  # (cap, N, D)
    dones: jax.Array  # (cap, 1)
    ptr: jax.Array  # () int32
    size: jax.Array  # () int32


@struct.dataclass
class MADDPGState:
    actor_params: Any  # stacked (N, ...) pytree
    critic_params: Any
    target_actor_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    buffer: ReplayBuffer
    env_states: Any
    obs: jax.Array  # (E, N, D) current observations
    ou_state: jax.Array  # (E, N, act)
    total_steps: jax.Array  # () int32
    iteration: jax.Array  # () int32, outer iterations finished


class MADDPG:
    """Mesh note: under a ``jax.sharding.Mesh`` the env farm (env_states /
    obs / OU noise) is sharded along the data axis while the replay buffer
    and parameters stay replicated — each step all-gathers the E fresh
    transition rows (a few KB) into the replicated buffer, and the
    update is computed identically on every device from the replicated
    buffer (no gradient psum needed; results are bit-identical to a
    single-device run). This is the "replicated buffer + sharded
    collection" design: collection is the MADDPG throughput term (the
    reference steps envs serially, ``maddpg.py:72-103``), the 256-row
    update is not worth sharding."""

    def __init__(
        self,
        cfg: MADDPGConfig,
        env_cfg: EnvConfig,
        mesh=None,
        scenario: str = "coverage",
    ):
        self.cfg = cfg
        self.env_cfg = env_cfg
        self.mesh = mesh
        if mesh is not None and cfg.n_envs % mesh.devices.size:
            raise ValueError(
                f"n_envs ({cfg.n_envs}) must divide over the mesh "
                f"({mesh.devices.size} devices)"
            )
        # scenario dispatch (see MAPPO.__init__)
        self.scenario = scenario
        if scenario == "coverage":
            self._reset_batch, self._step_batch = reset_batch, step_batch
            self._obs_fn = observation
        else:
            from ..envs import get_scenario
            from ..envs.vector import make_vec_fns

            self._reset_batch, self._step_batch = make_vec_fns(scenario)
            self._obs_fn = get_scenario(scenario)["observation"]
        if getattr(env_cfg, "resolved_action_mode", "continuous") != "continuous":
            raise NotImplementedError(
                "MADDPG is a continuous-control algorithm (tanh actor, "
                "maddpg.py:13-17); use MAPPO for discrete action modes"
            )
        n, d, a = env_cfg.n_agents, env_cfg.obs_dim, env_cfg.action_dim
        self.actor = RlkitMlp(
            output_size=a, hidden_sizes=cfg.hidden_sizes, tanh_output=True
        )
        self.critic = RlkitMlp(output_size=1, hidden_sizes=cfg.hidden_sizes)

        def tx(lr):
            adam = optax.adam(lr)
            if cfg.clip_grad > 0.0:
                return optax.chain(optax.clip(cfg.clip_grad), adam)
            return adam

        self.actor_tx = tx(cfg.actor_lr)
        self.critic_tx = tx(cfg.critic_lr)

    # ------------------------------------------------------------------
    def init_state(self, key: jax.Array) -> MADDPGState:
        cfg, env_cfg = self.cfg, self.env_cfg
        n, d, a = env_cfg.n_agents, env_cfg.obs_dim, env_cfg.action_dim
        k_a, k_c, k_env = jax.random.split(key, 3)
        dummy_obs = jnp.zeros((1, d), jnp.float32)
        dummy_q_in = jnp.zeros((1, n * d + n * a), jnp.float32)
        actor_params = jax.vmap(lambda k: self.actor.init(k, dummy_obs))(
            jax.random.split(k_a, n)
        )
        critic_params = jax.vmap(lambda k: self.critic.init(k, dummy_q_in))(
            jax.random.split(k_c, n)
        )
        env_states = self._reset_batch(env_cfg, k_env, cfg.n_envs)
        obs = jax.vmap(lambda s: self._obs_fn(env_cfg, s))(env_states)
        cap = cfg.buffer_capacity
        buffer = ReplayBuffer(
            obs=jnp.zeros((cap, n, d), jnp.float32),
            actions=jnp.zeros((cap, n, a), jnp.float32),
            rewards=jnp.zeros((cap, 1), jnp.float32),
            next_obs=jnp.zeros((cap, n, d), jnp.float32),
            dones=jnp.zeros((cap, 1), jnp.float32),
            ptr=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )
        return MADDPGState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=actor_params,
            target_critic_params=critic_params,
            actor_opt=jax.vmap(self.actor_tx.init)(actor_params),
            critic_opt=jax.vmap(self.critic_tx.init)(critic_params),
            buffer=buffer,
            env_states=env_states,
            obs=obs,
            ou_state=jnp.full((cfg.n_envs, n, a), cfg.ou_mu, jnp.float32),
            total_steps=jnp.zeros((), jnp.int32),
            iteration=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------
    def act(self, actor_params, key, obs, deterministic: bool = True):
        """Deterministic per-agent policy on (..., N, D) observations —
        the Learner/render-facing analog of MAPPO.act (the reference's
        MADDPG ``get_action`` without exploration, ``maddpg.py:55-70``).
        Returns (action, None); DDPG has no log-probs."""
        del key, deterministic  # DDPG's policy is deterministic
        return self._actors(actor_params, obs), None

    # ------------------------------------------------------------------
    def _actors(self, stacked_params, obs_na: jax.Array) -> jax.Array:
        """Apply each agent's actor to its own obs.
        obs_na: (..., N, D) -> (..., N, act)."""
        return jax.vmap(
            lambda p, o: self.actor.apply(p, o), in_axes=(0, -2), out_axes=-2
        )(stacked_params, obs_na)

    def _ou_step(self, key, ou):
        """Vectorized Ornstein-Uhlenbeck noise (maddpg.py:170-179)."""
        cfg = self.cfg
        dx = cfg.ou_theta * (cfg.ou_mu - ou) + cfg.ou_sigma * jax.random.normal(
            key, ou.shape, ou.dtype
        )
        return ou + dx

    # ------------------------------------------------------------------
    def collect(self, st: MADDPGState, key: jax.Array, n_steps: int) -> MADDPGState:
        """Scan n_steps of env interaction with OU exploration into the
        replay buffer."""
        cfg, env_cfg = self.cfg, self.env_cfg
        E = cfg.n_envs

        def body(st: MADDPGState, k):
            k_ou, k_rand = jax.random.split(k)
            # keep the env farm sharded over the mesh's data axis (no-op
            # single-device); the buffer writes below gather the E rows
            st = st.replace(
                env_states=_mesh.constrain(st.env_states, self.mesh, 0),
                obs=_mesh.constrain(st.obs, self.mesh, 0),
                ou_state=_mesh.constrain(st.ou_state, self.mesh, 0),
            )
            det_act = self._actors(st.actor_params, st.obs)  # (E, N, a)
            ou = self._ou_step(k_ou, st.ou_state)
            rand_act = jax.random.uniform(
                k_rand, det_act.shape, jnp.float32, -1.0, 1.0
            )
            warm = st.total_steps < cfg.warmup_steps
            action = jnp.where(warm, rand_act, jnp.clip(det_act + ou, -1.0, 1.0))
            env_states, out = self._step_batch(env_cfg, st.env_states, action)
            done = out.done.astype(jnp.float32)[:, None]
            # reset OU state where the episode ended (maddpg.py:168-169)
            ou = jnp.where(out.done[:, None, None], cfg.ou_mu, ou)

            buf = st.buffer
            idx = (buf.ptr + jnp.arange(E)) % cfg.buffer_capacity
            buf = buf._replace(
                obs=buf.obs.at[idx].set(st.obs),
                actions=buf.actions.at[idx].set(action),
                rewards=buf.rewards.at[idx].set(out.reward[:, None]),
                next_obs=buf.next_obs.at[idx].set(out.obs),
                dones=buf.dones.at[idx].set(done),
                ptr=(buf.ptr + E) % cfg.buffer_capacity,
                size=jnp.minimum(buf.size + E, cfg.buffer_capacity),
            )
            st = st.replace(
                buffer=buf,
                env_states=env_states,
                obs=out.obs,
                ou_state=ou,
                total_steps=st.total_steps + E,
            )
            return st, (out.reward.mean(), out.coverage_rate)

        keys = jax.random.split(key, n_steps)
        st, (mean_rew, cover) = jax.lax.scan(body, st, keys)
        # coverage logged like the Learner does for MAPPO (learner.py:211-214):
        # per-env max over the collected window, then mean over envs
        return st, (mean_rew.mean(), cover.max(axis=0).mean())

    # ------------------------------------------------------------------
    def update_once(self, st: MADDPGState, key: jax.Array):
        """One gradient step for every agent (vmapped over the agent axis)."""
        cfg, env_cfg = self.cfg, self.env_cfg
        n, d, a = env_cfg.n_agents, env_cfg.obs_dim, env_cfg.action_dim
        B = cfg.batch_size

        idx = jax.random.randint(key, (B,), 0, jnp.maximum(st.buffer.size, 1))
        obs_b = st.buffer.obs[idx]  # (B, N, D)
        act_b = st.buffer.actions[idx]  # (B, N, a)
        rew_b = st.buffer.rewards[idx]  # (B, 1) shared
        nobs_b = st.buffer.next_obs[idx]
        done_b = st.buffer.dones[idx]

        # target joint action from all target actors (maddpg.py:74-78)
        next_acts = self._actors(st.target_actor_params, nobs_b)  # (B, N, a)
        q_in_next = jnp.concatenate(
            [nobs_b.reshape(B, n * d), next_acts.reshape(B, n * a)], axis=-1
        )
        q_in = jnp.concatenate(
            [obs_b.reshape(B, n * d), act_b.reshape(B, n * a)], axis=-1
        )

        agent_eye = jnp.eye(n, dtype=obs_b.dtype)[:, :, None]  # (N, N, 1) one-hot per agent

        def critic_loss_fn(cp_i, tcp_i):
            # shared team reward/done: every agent sees the same scalar
            # (environment.py:105-108 broadcast); reward_scale conditions
            # the TD targets (see MADDPGConfig)
            q_next = self.critic.apply(tcp_i, q_in_next)
            target = cfg.reward_scale * rew_b + (1.0 - done_b) * cfg.gamma * q_next
            target = jax.lax.stop_gradient(target)
            q = self.critic.apply(cp_i, q_in)
            return jnp.mean((q - target) ** 2)

        # critic update (vmap over agents)
        c_loss, c_grads = jax.vmap(jax.value_and_grad(critic_loss_fn))(
            st.critic_params, st.target_critic_params
        )
        c_updates, c_opt = jax.vmap(self.critic_tx.update)(
            c_grads, st.critic_opt, st.critic_params
        )
        critic_params = jax.vmap(optax.apply_updates)(st.critic_params, c_updates)

        # actor update: replace own column of the joint action; the
        # pre-tanh regularizer (MADDPG paper impl's p_reg) keeps the
        # deterministic-policy gradient from saturating the tanh head
        def a_loss_fn(ap_i, cp_i, e_i):
            obs_i = jnp.sum(obs_b * e_i, axis=1)  # (B, d) = obs of agent i
            own_i, pre_i = self.actor.apply(ap_i, obs_i, return_pre=True)
            own_i = own_i[:, None, :]  # (B, 1, a)
            acts = act_b * (1.0 - e_i) + own_i * e_i
            q_in_pi = jnp.concatenate(
                [obs_b.reshape(B, n * d), acts.reshape(B, n * a)], axis=-1
            )
            loss = -jnp.mean(self.critic.apply(cp_i, q_in_pi))
            if cfg.action_reg > 0.0:
                loss = loss + cfg.action_reg * jnp.mean(pre_i**2)
            return loss

        a_loss, a_grads = jax.vmap(jax.value_and_grad(a_loss_fn))(
            st.actor_params, critic_params, agent_eye
        )
        a_updates, a_opt = jax.vmap(self.actor_tx.update)(
            a_grads, st.actor_opt, st.actor_params
        )
        actor_params = jax.vmap(optax.apply_updates)(st.actor_params, a_updates)

        # soft target updates (pytorch_utils.py:51-57)
        soft = lambda t, s: jax.tree_util.tree_map(
            lambda tp, sp: tp * (1.0 - cfg.tau) + sp * cfg.tau, t, s
        )
        st = st.replace(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor_params=soft(st.target_actor_params, actor_params),
            target_critic_params=soft(st.target_critic_params, critic_params),
            actor_opt=a_opt,
            critic_opt=c_opt,
        )
        return st, (c_loss.mean(), a_loss.mean())

    # ------------------------------------------------------------------
    def eval_iteration(self, st: MADDPGState, key: jax.Array, n_envs: int):
        """Deterministic-policy eval rollout (no OU noise)."""
        env_cfg = self.env_cfg
        k_reset, _ = jax.random.split(key)
        states = self._reset_batch(env_cfg, k_reset, n_envs)
        obs = jax.vmap(lambda s: self._obs_fn(env_cfg, s))(states)

        def body(carry, _):
            states, obs = carry
            action = self._actors(st.actor_params, obs)
            states, out = self._step_batch(env_cfg, states, action)
            return (states, out.obs), (out.reward, out.coverage_rate)

        (_, _), (rew, cover) = jax.lax.scan(
            body, (states, obs), None, length=self.cfg.steps_per_iter
        )
        return {"reward": rew.mean(axis=1).sum(), "coverage_rate": cover.max(axis=0).mean()}

    # ------------------------------------------------------------------
    def train_iteration(self, st: MADDPGState, key: jax.Array):
        cfg = self.cfg
        k_collect, k_update = jax.random.split(key)
        st, (mean_rew, cover) = self.collect(st, k_collect, cfg.steps_per_iter)

        def upd(st, k):
            st, losses = self.update_once(st, k)
            return st, losses

        do_updates = st.buffer.size >= cfg.batch_size

        def run_updates(st):
            return jax.lax.scan(
                upd, st, jax.random.split(k_update, cfg.updates_per_iter)
            )

        def skip(st):
            z = jnp.zeros((cfg.updates_per_iter,), jnp.float32)
            return st, (z, z)

        st, (c_losses, a_losses) = jax.lax.cond(do_updates, run_updates, skip, st)
        st = st.replace(iteration=st.iteration + 1)
        return st, {
            "reward": mean_rew,
            "coverage_rate": cover,
            "qf_loss": c_losses.mean(),
            "policy_loss": a_losses.mean(),
        }
