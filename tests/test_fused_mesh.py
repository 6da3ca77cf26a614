"""Mesh-compatibility of the fused Pallas kernels (round-3 VERDICT item 1).

The fused loss+gradient kernels, the fused trunk, and the Pallas GAE kernel
are shard_map'd over the data (env) axis under a multi-device mesh
(``mappo.py:_update_fused_full_sharded`` / ``_gae_pallas_sharded`` /
``models/mlp.py`` ``fused_mesh``): each shard runs the kernel on its local
env rows, parameter-gradient accumulators are psum-reduced, parameters stay
replicated. These tests prove the sharded path is numerically equivalent to
the single-device fused path on the virtual 8-device CPU mesh (interpret
mode — the pattern of ``tests/test_parallel.py:47``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import EnvConfig
from dcc_tpu.ops.gae import compute_gae
from dcc_tpu.parallel import make_mesh, replicated

ENV = EnvConfig()


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(jax.devices()[:8])


def _cfg(**kw):
    kw.setdefault("n_rollout_threads", 16)
    kw.setdefault("episode_length", 10)
    kw.setdefault("ppo_epoch", 3)
    kw.setdefault("n_iters", 4)
    kw.setdefault("fused_loss", "interpret")
    kw.setdefault("fused_trunk", "interpret")
    return MAPPOConfig(**kw)


def _run_pair(mesh, cfg):
    """One train_iteration on the single-device fused path and on the
    8-shard fused path, same keys; returns (ts1, m1, ts8, m8)."""
    key = jax.random.PRNGKey(0)
    run_key = jax.random.PRNGKey(1)

    algo1 = MAPPO(cfg, ENV)
    assert algo1._fused_loss
    ts1 = algo1.init_state(key)
    ts1b, m1 = jax.jit(algo1.train_iteration)(ts1, run_key)

    algo8 = MAPPO(cfg, ENV, mesh=mesh)
    assert algo8._fused_loss, "mesh must no longer disable the fused loss"
    ts8 = jax.device_put(algo8.init_state(key), replicated(mesh))
    ts8b, m8 = jax.jit(algo8.train_iteration)(
        ts8, jax.device_put(run_key, replicated(mesh))
    )
    return ts1b, m1, ts8b, m8


def _assert_params_close(t1, t8, rtol=2e-4, atol=2e-5):
    for l1, l8 in zip(
        jax.tree_util.tree_leaves(t1), jax.tree_util.tree_leaves(t8)
    ):
        np.testing.assert_allclose(
            np.asarray(l1, np.float32), np.asarray(l8, np.float32),
            rtol=rtol, atol=atol,
        )


def test_fused_sharded_matches_single_device(mesh):
    """Default (ValueNorm) config: the shard_map'd fused update produces the
    same metrics and post-update parameters as the single-device fused path
    (psum reassociation is the only difference)."""
    ts1, m1, ts8, m8 = _run_pair(mesh, _cfg())
    np.testing.assert_allclose(float(m1.reward), float(m8.reward), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m8.value_loss), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(m1.policy_loss), float(m8.policy_loss), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(m1.dist_entropy), float(m8.dist_entropy), rtol=1e-5
    )
    _assert_params_close(ts1.actor_params, ts8.actor_params)
    _assert_params_close(ts1.critic_params, ts8.critic_params)
    # the normalizer followed the identical stats trajectory
    _assert_params_close(ts1.vnorm, ts8.vnorm, rtol=1e-6, atol=1e-8)


def test_fused_sharded_popart(mesh):
    """PopArt's per-epoch head rescale reduces to precomputed affine
    scalars in the sharded path (``_norm_seq``) — must match the
    single-device path's in-loop PA.update."""
    cfg = _cfg(use_popart=True, use_valuenorm=False)
    ts1, m1, ts8, m8 = _run_pair(mesh, cfg)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m8.value_loss), rtol=1e-3, atol=1e-6
    )
    _assert_params_close(ts1.critic_params, ts8.critic_params)
    _assert_params_close(ts1.popart, ts8.popart, rtol=1e-6, atol=1e-8)


def test_fused_sharded_bf16(mesh):
    """The headline bf16 configuration (bf16 trunk matmuls, bf16 obs
    storage) on the sharded path vs single device."""
    cfg = _cfg(compute_dtype="bfloat16")
    ts1, m1, ts8, m8 = _run_pair(mesh, cfg)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m8.value_loss), rtol=5e-3, atol=1e-4
    )
    _assert_params_close(ts1.actor_params, ts8.actor_params, rtol=1e-3, atol=1e-4)


def test_gae_pallas_sharded_matches_scan(mesh):
    """The shard_map'd Pallas GAE equals the lax.scan formulation."""
    algo = MAPPO(_cfg(), ENV, mesh=mesh)
    k = jax.random.PRNGKey(3)
    T, E = 12, 16
    r = jax.random.normal(jax.random.fold_in(k, 0), (T, E, 1), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(k, 1), (T + 1, E, 1), jnp.float32)
    m = (
        jax.random.uniform(jax.random.fold_in(k, 2), (T + 1, E, 1)) > 0.1
    ).astype(jnp.float32)
    adv_s, ret_s = compute_gae(r, v, m, 0.99, 0.95)
    adv_p, ret_p = jax.jit(
        lambda r, v, m: algo._gae_pallas_sharded(
            r, v, m, 0.99, 0.95, interpret=True
        )
    )(r, v, m)
    np.testing.assert_allclose(
        np.asarray(adv_s), np.asarray(adv_p), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ret_s), np.asarray(ret_p), rtol=1e-5, atol=1e-5
    )


def test_fused_mesh_dispatch_rules(mesh):
    """Mesh dispatch: forcing fused_loss with num_mini_batch>1 under a
    multi-device mesh raises (row permutations gather across shards), and a
    non-divisible env count raises instead of mis-sharding."""
    with pytest.raises(ValueError, match="num_mini_batch"):
        MAPPO(_cfg(num_mini_batch=2), ENV, mesh=mesh)
    with pytest.raises(ValueError, match="divisible"):
        MAPPO(_cfg(n_rollout_threads=12), ENV, mesh=mesh)
    # single device: nmb>1 fused stays allowed
    algo = MAPPO(_cfg(num_mini_batch=2, n_rollout_threads=4), ENV)
    assert algo._fused_loss


def test_mesh_checkpoint_exact_resume(tmp_path, mesh):
    """Checkpoint/resume under the mesh with the shard_map'd fused kernels:
    save after 2 iterations, restore into a fresh mesh Learner, and the
    restored parameters match the saved ones exactly — the orbax round trip
    handles mesh-sharded (replicated) arrays."""
    import os

    from dcc_tpu.runtime.learner import Learner

    overrides = dict(
        n_iters=2,
        n_rollout_threads=16,
        n_eval_rollout_threads=16,
        max_ep_len=5,
        ppo_epoch=1,
        eval_interval=10,
        render_interval=10,
        save_interval=2,
        main_save_path=str(tmp_path),
        fused_loss="interpret",
        fused_trunk="interpret",
    )
    learner = Learner(overrides, use_mesh=True)
    assert learner.algo._fused_loss
    learner.train()
    path = os.path.join(learner.output_path, "models_2")
    assert os.path.exists(path)

    l2 = Learner(
        {
            **overrides,
            "n_iters": 1,
            "load_model": True,
            "load_model_path": path,
            # separate run dir: same-minute runs share the timestamped name
            "main_save_path": str(tmp_path / "resume"),
        },
        use_mesh=True,
    )
    assert int(l2.ts.iteration) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(l2.ts.actor_params),
        jax.tree_util.tree_leaves(learner.ts.actor_params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the restored state continues training on the mesh
    l2.train()
    assert int(l2.ts.iteration) == 3
