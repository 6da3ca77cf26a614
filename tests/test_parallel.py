"""Multi-device SPMD tests on the virtual 8-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8), the TPU analog of multi-node
testing without a cluster (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import EnvConfig
from dcc_tpu.parallel import data_sharding, make_mesh, replicated

ENV = EnvConfig()


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(jax.devices()[:8])


def _cfg(**kw):
    return MAPPOConfig(
        n_rollout_threads=16, episode_length=10, ppo_epoch=2, n_iters=4, **kw
    )


def test_mesh_shape(mesh):
    assert mesh.axis_names == ("data",)
    assert mesh.devices.shape == (8,)


def test_sharded_train_iteration_runs(mesh):
    algo = MAPPO(_cfg(), ENV, mesh=mesh)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts = jax.device_put(ts, replicated(mesh))
    key = jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
    ts2, m = jax.jit(algo.train_iteration)(ts, key)
    assert np.isfinite(float(m.reward))
    assert int(ts2.update_count) == 2
    # params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(ts2.actor_params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)


def test_sharded_matches_single_device(mesh):
    """DP over the env axis must be numerically equivalent to single-device
    execution (same batch, reductions reordered -> fp-noise only)."""
    key = jax.random.PRNGKey(0)
    run_key = jax.random.PRNGKey(1)

    algo1 = MAPPO(_cfg(), ENV)
    ts1 = algo1.init_state(key)
    _, m1 = jax.jit(algo1.train_iteration)(ts1, run_key)

    algo8 = MAPPO(_cfg(), ENV, mesh=mesh)
    ts8 = algo8.init_state(key)
    ts8 = jax.device_put(ts8, replicated(mesh))
    _, m8 = jax.jit(algo8.train_iteration)(ts8, jax.device_put(run_key, replicated(mesh)))

    np.testing.assert_allclose(float(m1.reward), float(m8.reward), rtol=1e-4)
    np.testing.assert_allclose(float(m1.value_loss), float(m8.value_loss), rtol=1e-3)
    np.testing.assert_allclose(float(m1.dist_entropy), float(m8.dist_entropy), rtol=1e-4)


def test_rollout_states_sharded_over_envs(mesh):
    algo = MAPPO(_cfg(), ENV, mesh=mesh)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts = jax.device_put(ts, replicated(mesh))
    traj = jax.jit(lambda ts, k: algo.rollout(ts, k, 16))(
        ts, jax.device_put(jax.random.PRNGKey(1), replicated(mesh))
    )
    # trajectory leaves live across all 8 devices
    assert len(traj.obs.sharding.device_set) == 8


def test_data_sharding_helper(mesh):
    s = data_sharding(mesh, ndim=3, axis=1)
    x = jax.device_put(jnp.zeros((2, 16, 4)), s)
    assert len(x.sharding.device_set) == 8


def test_maddpg_mesh_matches_single_device(mesh):
    """MADDPG under the mesh (sharded env collection, replicated buffer +
    update) must match single-device execution: the collected transitions
    are identical, the replicated update sees the same buffer, so one
    train_iteration's metrics agree to fp-reduction noise."""
    from dcc_tpu.algos.maddpg import MADDPG, MADDPGConfig

    cfg = MADDPGConfig(
        n_envs=16,
        steps_per_iter=20,
        updates_per_iter=3,
        batch_size=32,
        warmup_steps=0,
        buffer_capacity=2048,
    )
    key = jax.random.PRNGKey(0)
    run_key = jax.random.PRNGKey(1)

    algo1 = MADDPG(cfg, ENV)
    st1 = algo1.init_state(key)
    st1b, m1 = jax.jit(algo1.train_iteration)(st1, run_key)

    algo8 = MADDPG(cfg, ENV, mesh=mesh)
    st8 = algo8.init_state(key)
    st8 = jax.device_put(st8, replicated(mesh))
    st8b, m8 = jax.jit(algo8.train_iteration)(
        st8, jax.device_put(run_key, replicated(mesh))
    )

    np.testing.assert_allclose(float(m1["reward"]), float(m8["reward"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1["qf_loss"]), float(m8["qf_loss"]), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m1["policy_loss"]), float(m8["policy_loss"]), rtol=1e-3, atol=1e-6
    )
    # identical buffer contents (collection is deterministic given the key)
    np.testing.assert_allclose(
        np.asarray(st1b.buffer.obs[:320]),
        np.asarray(st8b.buffer.obs[:320]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_factory_builds_maddpg_with_mesh(mesh):
    """The factory no longer refuses MADDPG + mesh (VERDICT r2 missing #3)."""
    from dcc_tpu.algos.factory import make_algo
    from dcc_tpu.algos.maddpg import MADDPG as M

    algo = make_algo({"algo_file": "maddpg", "n_rollout_threads": 16}, ENV, mesh=mesh)
    assert isinstance(algo, M)
    assert algo.mesh is mesh


def test_separated_policy_sharded_matches_single_device(mesh):
    """Per-agent (separated) MAPPO under the mesh: the per-agent vmapped
    update is pure XLA, so GSPMD shards the env axis and the metrics must
    match single-device execution to fp-reduction noise."""
    cfg = _cfg(share_policy=False)
    key, run_key = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    algo1 = MAPPO(cfg, ENV)
    _, m1 = jax.jit(algo1.train_iteration)(algo1.init_state(key), run_key)

    algo8 = MAPPO(cfg, ENV, mesh=mesh)
    from dcc_tpu.parallel import replicated

    ts8 = jax.device_put(algo8.init_state(key), replicated(mesh))
    _, m8 = jax.jit(algo8.train_iteration)(
        ts8, jax.device_put(run_key, replicated(mesh))
    )
    np.testing.assert_allclose(float(m1.reward), float(m8.reward), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m8.value_loss), rtol=1e-3, atol=1e-6
    )


def test_recurrent_policy_sharded_matches_single_device(mesh):
    """GRU policy under the mesh (XLA path; the fused kernels stay off for
    recurrent configs): metrics match single-device execution."""
    cfg = _cfg(use_recurrent_policy=True, data_chunk_length=5)
    key, run_key = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    algo1 = MAPPO(cfg, ENV)
    _, m1 = jax.jit(algo1.train_iteration)(algo1.init_state(key), run_key)

    algo8 = MAPPO(cfg, ENV, mesh=mesh)
    from dcc_tpu.parallel import replicated

    ts8 = jax.device_put(algo8.init_state(key), replicated(mesh))
    _, m8 = jax.jit(algo8.train_iteration)(
        ts8, jax.device_put(run_key, replicated(mesh))
    )
    np.testing.assert_allclose(float(m1.reward), float(m8.reward), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m8.value_loss), rtol=1e-3, atol=1e-6
    )


def test_learner_end_to_end_on_mesh(tmp_path, mesh):
    """The full Learner (config -> factory -> train/eval/render/save loop)
    on the 8-device mesh with the shard_map'd fused kernels (interpret
    mode): the '--mesh' CLI path, end to end."""
    from dcc_tpu.runtime.learner import Learner

    overrides = dict(
        n_iters=2,
        n_rollout_threads=16,
        n_eval_rollout_threads=16,
        max_ep_len=5,
        ppo_epoch=1,
        eval_interval=1,
        render_interval=10,
        save_interval=10,
        main_save_path=str(tmp_path),
        fused_loss="interpret",
        fused_trunk="interpret",
    )
    learner = Learner(overrides, use_mesh=True)
    assert learner.mesh is not None and learner.mesh.devices.size == 8
    assert learner.algo._fused_loss
    learner.train()
    assert int(learner.ts.iteration) == 2
