"""Parity harness against the torch/numpy reference (SURVEY.md section 7,
build-plan item 8).

The reference publishes no numbers, so its *behavior* is the baseline: given
the same action sequence from the same reset, the pure-JAX env must reproduce
the reference's per-step observations, rewards, dones, and coverage rates
(``envs/mpe/multiagent/CoverageWorld.py``, ``scenarios/coverage.py``,
``environment.py:86-110`` including the xN shared-reward sum).

Workflow:

* ``scripts/record_golden.py`` drives the *reference* tree (shimmed to run on
  modern Python) with recorded random actions and writes ``.npz`` golden
  traces into ``tests/golden/``;
* :func:`load_golden` / :func:`replay` / :func:`compare` replay the same
  actions through the jitted JAX env and diff every step;
* ``tests/test_env_parity.py`` asserts the diffs (exact to ~1e-10 with the
  connectivity force off, for the stock 4x20 AND the ctor-patched 5x10
  shapes; <=1e-6 with the force on — the measured floor is 2.1e-8, one
  FMA-contraction ULP at the first speed clamp amplified by the softplus
  contact margin's 1e3 Lipschitz, see the test module docstring).

Reset parity needs no RNG bridging: the reference resets agents at the
origin and draws PoIs from the frozen ``pos_pois.npy`` bank
(``scenarios/coverage.py:64-78``), which this package ships verbatim.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import EnvConfig, observation, reset, step

DEFAULT_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "golden",
)


@dataclass
class GoldenTrace:
    """One recorded reference episode: actions in, expected outputs."""

    cfg: EnvConfig
    actions: np.ndarray  # (T, N, 2)
    obs0: np.ndarray  # (N, obs_dim) reset observation
    obs: np.ndarray  # (T, N, obs_dim)
    rewards: np.ndarray  # (T, N) — identical across agents (shared team sum)
    dones: np.ndarray  # (T, N)
    coverage: np.ndarray  # (T,)

    @property
    def shared_reward(self) -> np.ndarray:  # (T,)
        return self.rewards[:, 0]

    @property
    def team_done(self) -> np.ndarray:  # (T,)
        return self.dones.all(axis=1)


def load_golden(name: str, golden_dir: Optional[str] = None) -> GoldenTrace:
    g = np.load(os.path.join(golden_dir or DEFAULT_GOLDEN_DIR, name + ".npz"))
    cfg = EnvConfig(
        n_agents=int(g["num_agents"]),
        n_pois=int(g["num_pois"]),
        comm_force_scale=float(g["comm_force_scale"]),
        comm_r_scale=float(g["comm_r_scale"]),
    )
    return GoldenTrace(
        cfg=cfg,
        actions=g["actions"],
        obs0=g["obs0"],
        obs=g["obs"],
        rewards=g["rewards"],
        dones=g["dones"],
        coverage=g["coverage_rate"],
    )


@functools.partial(jax.jit, static_argnums=0)
def _replay(cfg: EnvConfig, state, actions):
    def body(s, a):
        s, out = step(cfg, s, a)
        return s, out

    return jax.lax.scan(body, state, actions)


def replay(trace: GoldenTrace, dtype=jnp.float64):
    """Replay the trace's actions through the JAX env; returns
    (reset_obs, step_outputs) as device arrays."""
    state = reset(trace.cfg, jax.random.PRNGKey(0), dtype=dtype)
    obs0 = observation(trace.cfg, state)
    _, out = _replay(trace.cfg, state, jnp.asarray(trace.actions, dtype))
    return obs0, out


def compare(trace: GoldenTrace, dtype=jnp.float64) -> Dict[str, float]:
    """Max absolute per-step deviation from the golden trace, per field."""
    obs0, out = replay(trace, dtype)
    return {
        "obs0": float(np.abs(np.asarray(obs0) - trace.obs0).max()),
        "obs": float(np.abs(np.asarray(out.obs) - trace.obs).max()),
        "reward": float(
            np.abs(np.asarray(out.reward) - trace.shared_reward).max()
        ),
        "done": float(
            np.abs(np.asarray(out.done, np.float64) - trace.team_done).max()
        ),
        "coverage": float(
            np.abs(np.asarray(out.coverage_rate) - trace.coverage).max()
        ),
    }


__all__ = ["GoldenTrace", "load_golden", "replay", "compare", "DEFAULT_GOLDEN_DIR"]
