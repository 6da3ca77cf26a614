"""Golden-trace parity: the pure-JAX env must reproduce the reference
environment's per-step observations / rewards / dones / coverage rates.

Golden files are recorded from the torch/numpy reference by
``scripts/record_golden.py`` (random-action traces under fixed seed) and
committed under ``tests/golden/``. The replay runs as one ``lax.scan`` in
float64, so tolerances are fp-reordering noise only:

* force off (default config): exact to ~1e-12
* connectivity force on (``connect_4x20``): XLA's FMA contraction rounds
  the speed-clamp norm (vx*vx + vy*vy) one ULP differently than numpy's
  separate mul+add — measured: positions exact through step 0, a single
  1.4e-17 velocity ULP appears at the first clamped step, then the softplus
  pull force's 1/contact_margin = 1e3 Lipschitz amplifies it ~x10 per
  contact event to a measured max of 2.1e-8 (obs) / 1.1e-6 (reward) over
  300 steps. The 1e-6/1e-5 tolerances below bound that ULP-amplification
  floor with headroom; anything looser would hide real physics errors.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.envs import EnvConfig, observation, reset, step

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@functools.partial(jax.jit, static_argnums=0)
def _replay(cfg, state, actions):
    def body(s, a):
        s, out = step(cfg, s, a)
        return s, out

    return jax.lax.scan(body, state, actions)


def _load(name):
    g = np.load(os.path.join(GOLDEN, name + ".npz"))
    cfg = EnvConfig(
        n_agents=int(g["num_agents"]),
        n_pois=int(g["num_pois"]),
        comm_force_scale=float(g["comm_force_scale"]),
        comm_r_scale=float(g["comm_r_scale"]),
    )
    return cfg, g


@pytest.mark.parametrize(
    "name,tol_obs,tol_rew",
    [
        ("default_4x20", 1e-10, 1e-8),
        ("connect_4x20", 1e-6, 1e-5),
        ("connect_smallact_4x20", 1e-10, 1e-8),
        # N!=4 through the ctor-patched reference (make_world's 4/20
        # hardcode redirected; scripts/record_golden.py SOURCE_PATCHES) —
        # validates the N-generic physics against the reference itself
        # instead of only against our own implementation
        ("default_5x10", 1e-10, 1e-8),
        ("connect_5x10", 1e-10, 1e-8),
        ("default_10x20", 1e-10, 1e-8),
    ],
)
def test_golden_trace(name, tol_obs, tol_rew):
    cfg, g = _load(name)
    state = reset(cfg, jax.random.PRNGKey(0), dtype=jnp.float64)

    # reset parity (agents at origin, PoIs from the frozen bank)
    np.testing.assert_allclose(
        np.asarray(observation(cfg, state)), g["obs0"], atol=1e-12
    )

    _, outs = _replay(cfg, state, jnp.asarray(g["actions"]))
    np.testing.assert_allclose(np.asarray(outs.obs), g["obs"], atol=tol_obs)
    np.testing.assert_allclose(
        np.asarray(outs.reward), g["rewards"][:, 0], atol=tol_rew
    )
    np.testing.assert_array_equal(
        np.asarray(outs.done), g["dones"].all(axis=1)
    )
    np.testing.assert_allclose(
        np.asarray(outs.coverage_rate), g["coverage_rate"], atol=1e-12
    )


def test_shared_reward_is_identical_across_agents():
    """Reference broadcasts the team total to every agent
    (environment.py:105-108); our StepOut carries one scalar -- check the
    golden per-agent rewards really are identical so the scalar is lossless."""
    _, g = _load("default_4x20")
    r = g["rewards"]
    assert np.all(r == r[:, :1])
