"""Gym-style facades over the functional env, for users migrating from the
reference.

``DCEnv`` mirrors the reference facade of the same name
(``envs/mpe/uav_dcc.py:7-58``): ``reset() -> obs[n_agents, obs_dim]``,
``step(actions) -> (obs, rewards[n_agents], dones[n_agents], info)`` with
``info["coverage_rate"]``, plus ``observation_space`` / ``action_space`` /
``share_observation_space`` lists.

``VecDCEnv`` replaces both ``DummyVecEnv`` and ``SubprocVecEnv``
(``envs/wrappers.py:133-261``): the same lock-step batched API, but the
"farm" is one on-device vmapped program — n_envs is a batch dimension, not a
process count. Auto-reset semantics match the worker protocol: a done env
returns its reset observation with the pre-reset reward/done
(``wrappers.py:104-110``).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np

from .coverage import EnvConfig, observation, reset, step
from .spaces import Box, Discrete, MultiBinary, MultiDiscrete, TupleSpace
from .vector import reset_batch, step_batch


def _one_action_space(cfg: EnvConfig):
    """The true per-agent action space for every action mode — the
    reference builds the mode-specific gym space in ``environment.py:43-77``
    (Box / Discrete(5) / MultiDiscrete / MultiBinary / Box+Discrete tuple);
    decode semantics live in ``coverage.step`` (``envs/coverage.py``)."""
    mode = cfg.resolved_action_mode
    if mode == "discrete":
        return Discrete(cfg.action_dim)
    if mode == "multi_discrete":
        # per-axis branch index in [0, k-1] (decoded to {-1,0,+1} forces)
        return MultiDiscrete([[0, k - 1] for k in cfg.action_head_dims])
    if mode == "multi_binary":
        return MultiBinary(cfg.action_dim)
    if mode == "mixed":
        box_dim, n_cat = cfg.action_head_dims
        return TupleSpace(
            [Box(low=-1.0, high=1.0, shape=(box_dim,)), Discrete(n_cat)]
        )
    return Box(low=-1.0, high=1.0, shape=(cfg.action_dim,))


def _make_spaces(cfg: EnvConfig):
    obs_space = [
        Box(low=-np.inf, high=np.inf, shape=(cfg.obs_dim,)) for _ in range(cfg.n_agents)
    ]
    act_space = [_one_action_space(cfg) for _ in range(cfg.n_agents)]
    share_space = [
        Box(low=-np.inf, high=np.inf, shape=(cfg.share_obs_dim,))
        for _ in range(cfg.n_agents)
    ]
    return obs_space, act_space, share_space


class DCEnv:
    """Single-env facade (reference envs/mpe/uav_dcc.py API)."""

    def __init__(self, cfg: Optional[EnvConfig] = None, seed: int = 0, **kwargs):
        if cfg is None:
            cfg = EnvConfig(**kwargs)
        self.cfg = cfg
        self.n_agents = cfg.n_agents
        self.max_ep_len = cfg.max_ep_len
        self.observation_space, self.action_space, self.share_observation_space = (
            _make_spaces(cfg)
        )
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._step = jax.jit(lambda s, a: step(cfg, s, a))

    def seed(self, seed: int):
        self._key = jax.random.PRNGKey(seed)

    def reset(self) -> np.ndarray:
        self._key, k = jax.random.split(self._key)
        self._state = reset(self.cfg, k)
        return np.asarray(observation(self.cfg, self._state))

    def step(self, actions):
        self._state, out = self._step(self._state, np.asarray(actions))
        obs = np.asarray(out.obs)
        rew = np.full((self.n_agents,), float(out.reward))  # shared team reward
        done = np.full((self.n_agents,), bool(out.done))
        info = {"coverage_rate": float(out.coverage_rate)}
        return obs, rew, done, info

    def render(self, mode: str = "rgb_array"):
        from ..render.gif import draw_frame

        s = self._state
        return draw_frame(
            self.cfg,
            np.asarray(s.pos),
            np.asarray(s.poi_pos),
            np.asarray(s.energy),
            np.asarray(s.poi_done),
        )

    def close(self):
        pass


class VecDCEnv:
    """Batched lock-step facade (replaces Dummy/SubprocVecEnv)."""

    def __init__(self, cfg: Optional[EnvConfig] = None, n_envs: int = 16, seed: int = 0, **kwargs):
        if cfg is None:
            cfg = EnvConfig(**kwargs)
        self.cfg = cfg
        self.n_envs = n_envs
        self.n_agents = cfg.n_agents
        self.observation_space, self.action_space, self.share_observation_space = (
            _make_spaces(cfg)
        )
        self._key = jax.random.PRNGKey(seed)
        self._states = None
        self._obs_fn = jax.jit(jax.vmap(lambda s: observation(cfg, s)))
        self._step = jax.jit(lambda s, a: step_batch(cfg, s, a))

    def reset(self) -> np.ndarray:
        self._key, k = jax.random.split(self._key)
        self._states = reset_batch(self.cfg, k, self.n_envs)
        return np.asarray(self._obs_fn(self._states))

    def step(self, actions):
        self._states, out = self._step(self._states, np.asarray(actions))
        obs = np.asarray(out.obs)
        rews = np.repeat(
            np.asarray(out.reward)[:, None, None], self.n_agents, axis=1
        )  # (E, A, 1), wrappers.py:165 reshape
        dones = np.repeat(np.asarray(out.done)[:, None], self.n_agents, axis=1)
        infos = [
            {"coverage_rate": float(c)} for c in np.asarray(out.coverage_rate)
        ]
        return obs, rews, dones, infos

    def render(self, mode: str = "human", size: int = 256):
        """Render every env and tile them into one near-square grid image
        (``ShareVecEnv.render``, ``wrappers.py:69-78``). ``rgb_array``
        returns the per-env frames like ``SubprocVecEnv`` does; ``human``
        returns the tiled bigimg (headless: no window is opened)."""
        from ..render.gif import draw_frame
        from ..utils import tile_images

        if self._states is None:
            raise RuntimeError("render() before reset()")
        frames = np.stack(
            [
                draw_frame(
                    self.cfg,
                    np.asarray(self._states.pos[e]),
                    np.asarray(self._states.poi_pos[e]),
                    np.asarray(self._states.energy[e]),
                    np.asarray(self._states.poi_done[e]),
                    size=size,
                )
                for e in range(self.n_envs)
            ]
        )
        if mode == "rgb_array":
            return frames
        return tile_images(frames)

    def close(self):
        pass
