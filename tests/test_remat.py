"""use_remat must change memory behavior only — gradients, and therefore the
whole training trajectory, must be bit-identical to the non-remat path."""

import jax
import numpy as np

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import EnvConfig


def _one_iter(use_remat: bool):
    env_cfg = EnvConfig()
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=8, ppo_epoch=2, use_remat=use_remat
    )
    algo = MAPPO(cfg, env_cfg)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts, metrics = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    return ts, metrics


def test_remat_is_gradient_transparent():
    ts_a, m_a = _one_iter(False)
    ts_b, m_b = _one_iter(True)
    for pa, pb in zip(
        jax.tree_util.tree_leaves(ts_a.actor_params)
        + jax.tree_util.tree_leaves(ts_a.critic_params),
        jax.tree_util.tree_leaves(ts_b.actor_params)
        + jax.tree_util.tree_leaves(ts_b.critic_params),
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)
    np.testing.assert_allclose(
        float(m_a.value_loss), float(m_b.value_loss), atol=1e-6
    )
