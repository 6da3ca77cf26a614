"""Rank-3 (image) observation dispatch: MAPPO selects the CNN trunk for the
actor when the env exposes a rank-3 ``obs_shape`` (the reference's
``r_actor_critic.py:33`` base-class dispatch; VERDICT r1: the CNN module
existed but nothing reached it)."""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import register_scenario
from dcc_tpu.envs.coverage import EnvState, StepOut

GRID = 8


class PixelConfig(NamedTuple):
    """Toy image-obs scenario: each agent sees a GRIDxGRIDx2 occupancy map
    (channel 0: agents, channel 1: the goal)."""

    n_agents: int = 2
    max_ep_len: int = 6
    dt: float = 0.1
    max_speed: float = 0.5
    discrete_actions: bool = False

    @property
    def obs_shape(self) -> Tuple[int, int, int]:
        return (GRID, GRID, 2)

    @property
    def obs_dim(self) -> int:
        return GRID * GRID * 2

    @property
    def share_obs_dim(self) -> int:
        return self.n_agents * self.obs_dim

    @property
    def action_dim(self) -> int:
        return 2


def _rasterize(pos, grid=GRID):
    """(K, 2) world coords in [-1, 1] -> (grid, grid) occupancy (255)."""
    ij = jnp.clip(((pos + 1.0) * 0.5 * grid).astype(jnp.int32), 0, grid - 1)
    img = jnp.zeros((grid, grid), jnp.float32)
    return img.at[ij[:, 0], ij[:, 1]].add(255.0)


def observation(cfg: PixelConfig, state: EnvState) -> jax.Array:
    agents = _rasterize(state.pos)
    goal = _rasterize(state.poi_pos)
    img = jnp.stack([agents, goal], axis=-1)  # (G, G, 2)
    return jnp.broadcast_to(img[None], (cfg.n_agents, GRID, GRID, 2))


def reset(cfg: PixelConfig, key: jax.Array) -> EnvState:
    key, k_a, k_g = jax.random.split(key, 3)
    return EnvState(
        pos=jax.random.uniform(k_a, (cfg.n_agents, 2), jnp.float32, -1.0, 1.0),
        vel=jnp.zeros((cfg.n_agents, 2), jnp.float32),
        poi_pos=jax.random.uniform(k_g, (1, 2), jnp.float32, -1.0, 1.0),
        poi_vel=jnp.zeros((1, 2), jnp.float32),
        energy=jnp.zeros((1,), jnp.float32),
        poi_done=jnp.zeros((1,), bool),
        t=jnp.zeros((), jnp.int32),
        key=key,
    )


def step(cfg: PixelConfig, state: EnvState, action: jax.Array):
    vel = jnp.clip(state.vel + action * cfg.dt, -cfg.max_speed, cfg.max_speed)
    pos = jnp.clip(state.pos + vel * cfg.dt, -1.0, 1.0)
    d = jnp.sqrt(jnp.sum((pos - state.poi_pos) ** 2, axis=-1))
    t_next = state.t + 1
    new_state = state.replace(pos=pos, vel=vel, t=t_next)
    return new_state, StepOut(
        obs=observation(cfg, new_state),
        reward=-jnp.sum(d),
        done=jnp.zeros((), bool),
        coverage_rate=jnp.zeros(()),
        truncated=t_next >= cfg.max_ep_len,
    )


def _register():
    try:
        register_scenario(
            "pixel_toy",
            config_cls=PixelConfig,
            reset_fn=reset,
            step_fn=step,
            observation_fn=observation,
        )
    except ValueError:
        pass  # already registered in this process


def test_cnn_actor_rollout_and_update():
    _register()
    cfg = MAPPOConfig(
        n_rollout_threads=2, episode_length=4, ppo_epoch=1, n_iters=3,
        hidden_size=16,
    )
    algo = MAPPO(cfg, PixelConfig(), scenario="pixel_toy")
    # CNN trunk actually selected for the actor, MLP kept for the critic
    assert algo.actor.use_cnn and not algo.critic.use_cnn
    ts = algo.init_state(jax.random.PRNGKey(0))
    assert "Conv_0" in str(jax.tree_util.tree_structure(ts.actor_params))
    traj = jax.jit(lambda t, k: algo.rollout(t, k, 2))(ts, jax.random.PRNGKey(1))
    assert traj.obs.shape == (5, 2, 2, GRID, GRID, 2)
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(2))
    assert np.isfinite(float(m.value_loss))
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.actor_params, ts2.actor_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_cnn_actor_minibatch_path():
    _register()
    cfg = MAPPOConfig(
        n_rollout_threads=2, episode_length=4, ppo_epoch=1, n_iters=3,
        hidden_size=16, num_mini_batch=2,
    )
    algo = MAPPO(cfg, PixelConfig(), scenario="pixel_toy")
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert int(ts2.update_count) == 2
    assert np.isfinite(float(m.policy_loss))
