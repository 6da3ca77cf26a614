"""MAPPO trainer tests: wiring, loss semantics, and a short learning smoke
run (CPU, small shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import EnvConfig

ENV = EnvConfig()


def _small_algo(**kw):
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=20, ppo_epoch=2, n_iters=10, **kw
    )
    return MAPPO(cfg, ENV)


def test_rollout_shapes_and_masks():
    algo = _small_algo()
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda ts, k: algo.rollout(ts, k, 4))(ts, jax.random.PRNGKey(1))
    T, E, A = 20, 4, 4
    assert traj.obs.shape == (T + 1, E, A, 110)
    assert traj.actions.shape == (T, E, A, 2)
    assert traj.log_probs.shape == (T, E, A, 1)
    assert traj.values.shape == (T + 1, E, 1)
    assert traj.rewards.shape == (T, E, 1)
    assert traj.masks.shape == (T + 1, E, 1)
    assert np.all(np.asarray(traj.masks[0]) == 1.0)
    # masks reflect dones: all masks in {0,1}
    m = np.asarray(traj.masks)
    assert set(np.unique(m)).issubset({0.0, 1.0})


def test_log_probs_consistent_with_actions():
    """Replayed log-probs from evaluate must equal rollout-time log-probs
    before the first update (ratio == 1)."""
    algo = _small_algo()
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda ts, k: algo.rollout(ts, k, 4))(ts, jax.random.PRNGKey(1))
    from dcc_tpu.models import distributions as D

    obs = traj.obs[:-1].reshape(-1, 110)
    (mean, log_std), _ = algo.actor.apply(ts.actor_params, obs)
    lp = D.normal_log_prob(mean, log_std, traj.actions.reshape(-1, 2))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(traj.log_probs.reshape(-1, 1)), atol=1e-5
    )


def test_train_iteration_runs_and_updates_params():
    algo = _small_algo()
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    # params changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), ts.actor_params, ts2.actor_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    assert int(ts2.update_count) == 2  # ppo_epoch * num_mini_batch
    assert int(ts2.iteration) == 1
    for v in [m.reward, m.value_loss, m.policy_loss, m.dist_entropy, m.ratio]:
        assert np.isfinite(float(v))
    # first-update ratio should hover at 1 (on-policy)
    assert abs(float(m.ratio) - 1.0) < 0.1


def test_valuenorm_state_advances():
    algo = _small_algo()
    ts = algo.init_state(jax.random.PRNGKey(0))
    assert float(ts.vnorm.debias) == 0.0
    ts2, _ = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert float(ts2.vnorm.debias) > 0.0


def test_lr_decay_schedule():
    """Step the REAL actor optimizer with a constant gradient and check the
    applied update magnitudes follow lr0 * (1 - it/n_iters)
    (utils/util.py:29-33 semantics; lr held within an iteration's
    updates_per_iter steps, decayed between iterations). With a constant
    gradient adam's m_hat/sqrt(v_hat) == 1 exactly, so |update| ==
    lr(count) * |g|/(|g| + eps)."""
    algo = _small_algo()  # updates_per_iter = ppo_epoch*nmb = 2; n_iters = 10
    lr0, eps = 5e-4, 1e-5
    params = {"w": jnp.ones((3,))}
    g = {"w": jnp.asarray([1.0, -2.0, 0.5])}  # global norm < clip threshold
    opt = algo.actor_tx.init(params)
    mags = []
    for _ in range(4):
        upd, opt = algo.actor_tx.update(g, opt, params)
        mags.append(np.abs(np.asarray(upd["w"])))
    gabs = np.abs(np.asarray(g["w"]))
    scale = gabs / (gabs + eps)
    for step, it in ((0, 1), (1, 1), (2, 2), (3, 2)):
        expected = lr0 * (1.0 - it / 10.0) * scale
        np.testing.assert_allclose(mags[step], expected, rtol=1e-6)


def test_minibatch_gt_one_runs():
    algo = _small_algo(num_mini_batch=2)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert int(ts2.update_count) == 4
    assert np.isfinite(float(m.value_loss))


def test_popart_path_runs():
    algo = _small_algo(use_popart=True, use_valuenorm=False)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.value_loss))
    assert float(ts2.popart.debias) > 0


def test_no_valuenorm_path_runs():
    algo = _small_algo(use_valuenorm=False)
    ts = algo.init_state(jax.random.PRNGKey(0))
    _, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.value_loss))


def test_learning_improves_coverage():
    """Short CPU training run: coverage rate must trend up (reward at this
    tiny scale is dominated by the out-of-bounds penalty noise; the full
    200-iter run on TPU reproduces the reference's curve, see bench/README)."""
    cfg = MAPPOConfig(
        n_rollout_threads=8, episode_length=50, ppo_epoch=5, n_iters=60
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    _, metrics = jax.jit(lambda ts, k: algo.train_many(ts, k, 60))(
        ts, jax.random.PRNGKey(7)
    )
    rew = np.asarray(metrics.reward)
    cov = np.asarray(metrics.coverage_rate)
    assert np.all(np.isfinite(rew))
    assert cov[-10:].mean() > cov[:10].mean()


def test_eval_iteration():
    algo = _small_algo()
    ts = algo.init_state(jax.random.PRNGKey(0))
    out = jax.jit(lambda ts, k: algo.eval_iteration(ts, k, 4))(
        ts, jax.random.PRNGKey(3)
    )
    assert np.isfinite(float(out["reward"]))
    assert 0.0 <= float(out["coverage_rate"]) <= 1.0


def test_recurrent_rollout_and_update():
    """GRU policy: the chunked sequence replay with hidden-state warm starts
    (recurrent_generator, shared_buffer.py:378-487) must reproduce the
    rollout-time log-probs exactly (ratio == 1 on the first update), proving
    scan-GRU(rollout) == warm-started chunk replay(training)."""
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=12, ppo_epoch=1, n_iters=5,
        use_recurrent_policy=True, recurrent_n=1, hidden_size=32,
        data_chunk_length=6,  # 2 chunks/sequence: exercises the warm start
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert abs(float(m.ratio) - 1.0) < 1e-3
    assert np.isfinite(float(m.value_loss))
    # rnn params exist and were updated
    assert "rnn" in ts.actor_params["params"]
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        ts.actor_params["params"]["rnn"],
        ts2.actor_params["params"]["rnn"],
    )
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_recurrent_two_layers():
    cfg = MAPPOConfig(
        n_rollout_threads=2, episode_length=6, ppo_epoch=1, n_iters=2,
        use_recurrent_policy=True, recurrent_n=2, hidden_size=16,
        data_chunk_length=3,
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    _, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.reward))


def test_recurrent_chunked_matches_full_sequence():
    """Chunked warm-started replay vs naive full-sequence replay
    (VERDICT r1 item #3). Both evaluate the identical policy on identical
    states, so first-update LOSSES must agree for any L (forward
    equivalence of the warm start); with L=T the chunk machinery is a
    reshuffled full-sequence pass, so first-update GRADIENTS — hence
    updated params — must agree too. (For L<T gradients legitimately
    differ: chunk warm starts truncate BPTT at chunk boundaries, exactly
    as in the reference's recurrent_generator.)"""
    base = dict(
        n_rollout_threads=3, episode_length=8, ppo_epoch=1, n_iters=5,
        recurrent_n=1, hidden_size=24,
    )
    key, k_it = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def run(cfg):
        algo = MAPPO(cfg, ENV)
        ts = algo.init_state(key)
        return jax.jit(algo.train_iteration)(ts, k_it)

    ts_n, m_n = run(MAPPOConfig(use_naive_recurrent=True, **base))
    ts_c4, m_c4 = run(
        MAPPOConfig(use_recurrent_policy=True, data_chunk_length=4, **base)
    )
    ts_c8, m_c8 = run(
        MAPPOConfig(use_recurrent_policy=True, data_chunk_length=8, **base)
    )
    for m in (m_n, m_c4, m_c8):
        assert abs(float(m.ratio) - 1.0) < 1e-4
    # forward equivalence for truncated chunks (L=4): identical losses
    np.testing.assert_allclose(
        float(m_c4.policy_loss), float(m_n.policy_loss), atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_c4.value_loss), float(m_n.value_loss), atol=1e-6
    )
    # full gradient equivalence when chunks cover whole sequences (L=T)
    for a, b in zip(
        jax.tree_util.tree_leaves(ts_c8.actor_params),
        jax.tree_util.tree_leaves(ts_n.actor_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_recurrent_chunked_minibatches_train():
    """data_chunk_length chunking with num_mini_batch > 1 runs and updates."""
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=8, ppo_epoch=2, n_iters=5,
        use_recurrent_policy=True, data_chunk_length=4, num_mini_batch=2,
        hidden_size=16,
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.value_loss))
    assert int(ts2.update_count) == 4  # 2 epochs x 2 minibatches


def test_recurrent_chunk_divisibility_validated():
    cfg = MAPPOConfig(
        use_recurrent_policy=True, episode_length=12, data_chunk_length=10
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="divisible"):
        MAPPO(cfg, ENV)


def test_separated_policy_path():
    """share_policy=False: per-agent params/optimizers/value-normalizers
    (the reference's make_algo + SeparatedReplayBuffer path, which its
    learner never wires up -- learner.py:48 hardcodes shared MAPPO)."""
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=12, ppo_epoch=2, n_iters=5,
        share_policy=False, hidden_size=32,
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    # stacked per-agent params
    leaf = jax.tree_util.tree_leaves(ts.actor_params)[0]
    assert leaf.shape[0] == 4
    traj = jax.jit(lambda t, k: algo.rollout(t, k, 4))(ts, jax.random.PRNGKey(2))
    assert traj.values.shape == (12 + 1, 4, 4, 1)  # per-agent critics
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert abs(float(m.ratio) - 1.0) < 0.05
    assert np.isfinite(float(m.value_loss))
    # per-agent vnorm states advanced
    assert np.all(np.asarray(ts2.vnorm.debias) > 0)
    # agents trained on different data -> diverged parameters
    p = np.asarray(jax.tree_util.tree_leaves(ts2.actor_params)[1])
    assert not np.allclose(p[0], p[1])


@pytest.mark.parametrize(
    "extra",
    [
        {"num_mini_batch": 2},
        {"use_recurrent_policy": True, "data_chunk_length": 4},
        {"use_recurrent_policy": True, "data_chunk_length": 4, "num_mini_batch": 2},
        {"use_naive_recurrent": True},
        {"use_popart": True, "use_valuenorm": False},
        {"use_popart": True, "use_valuenorm": False, "num_mini_batch": 2},
    ],
    ids=["nmb2", "recurrent", "recurrent_nmb2", "naive_recurrent", "popart",
         "popart_nmb2"],
)
def test_separated_full_matrix(extra):
    """share_policy=False across the reference's full per-agent generator
    family (``separated_buffer.py:15-414``, ``make_algo.py:26-46``):
    feed-forward minibatching, recurrent chunks w/ warm starts,
    naive-recurrent, and per-agent PopArt heads."""
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=8, ppo_epoch=2, n_iters=5,
        share_policy=False, hidden_size=32, **extra,
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert abs(float(m.ratio) - 1.0) < 0.05
    assert np.isfinite(float(m.value_loss))
    assert np.isfinite(float(m.policy_loss))
    if cfg.use_popart:
        # per-agent popart stats advanced (stacked state, one row per agent)
        assert ts2.popart.debias.shape == (4,)
        assert np.all(np.asarray(ts2.popart.debias) > 0)
    else:
        assert np.all(np.asarray(ts2.vnorm.debias) > 0)
    # agents trained on their own data -> diverged parameters
    p = np.asarray(jax.tree_util.tree_leaves(ts2.actor_params)[1])
    assert not np.allclose(p[0], p[1])
    # params actually moved
    p0 = np.asarray(jax.tree_util.tree_leaves(ts.actor_params)[1])
    assert not np.allclose(p, p0)


def test_separated_recurrent_learns():
    """A few iterations of the separated recurrent path reduce the value
    loss on the tiny config (sanity that the chunked per-agent generator
    trains, not just runs)."""
    cfg = MAPPOConfig(
        n_rollout_threads=8, episode_length=8, ppo_epoch=4, n_iters=12,
        share_policy=False, hidden_size=32,
        use_recurrent_policy=True, data_chunk_length=4,
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    train = jax.jit(algo.train_iteration)
    losses = []
    for i in range(6):
        ts, m = train(ts, jax.random.PRNGKey(10 + i))
        losses.append(float(m.value_loss))
    assert np.isfinite(losses).all()
    assert min(losses[2:]) < losses[0]


def test_discrete_action_path():
    """discrete_actions: Discrete(5) head + index->force env decode
    (reference environment.py:48-52,171-185; Categorical ACTLayer)."""
    env_cfg = EnvConfig(discrete_actions=True)
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=12, ppo_epoch=2, n_iters=5,
        hidden_size=32,
    )
    algo = MAPPO(cfg, env_cfg)
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda t, k: algo.rollout(t, k, 4))(ts, jax.random.PRNGKey(2))
    acts = np.asarray(traj.actions)
    assert acts.shape == (12, 4, 4, 1)
    assert set(np.unique(acts)).issubset({0, 1, 2, 3, 4})
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert abs(float(m.ratio) - 1.0) < 0.05
    # near-uniform policy at init: entropy ~ log(5)
    assert abs(float(m.dist_entropy) - np.log(5)) < 0.2


def test_discrete_env_decode():
    from dcc_tpu.envs import reset, step

    env_cfg = EnvConfig(discrete_actions=True)
    s = reset(env_cfg, jax.random.PRNGKey(0))
    s2, _ = step(env_cfg, s, jnp.array([2, 1, 3, 4], jnp.int32))
    v = np.asarray(s2.vel)
    np.testing.assert_allclose(v[0], [0.5, 0.0], atol=1e-6)   # +x
    np.testing.assert_allclose(v[1], [-0.5, 0.0], atol=1e-6)  # -x
    np.testing.assert_allclose(v[2], [0.0, -0.5], atol=1e-6)  # -y
    np.testing.assert_allclose(v[3], [0.0, 0.5], atol=1e-6)   # +y


def test_trajectory_obs_storage_dtype():
    """store_obs_bf16: in bf16 mode the trajectory's obs rows are stored in
    bf16 (numerically free — the update casts obs to bf16 at the trunk input
    either way); float32 mode and the opt-out flag keep f32 storage."""
    traj_f32 = _small_algo().rollout(
        _small_algo().init_state(jax.random.PRNGKey(0)), jax.random.PRNGKey(1), 4
    )
    assert traj_f32.obs.dtype == jnp.float32
    algo_bf = _small_algo(compute_dtype="bfloat16")
    traj_bf = algo_bf.rollout(
        algo_bf.init_state(jax.random.PRNGKey(0)), jax.random.PRNGKey(1), 4
    )
    assert traj_bf.obs.dtype == jnp.bfloat16
    # rewards/values/masks stay f32 (GAE and losses are f32)
    assert traj_bf.rewards.dtype == jnp.float32
    assert traj_bf.values.dtype == jnp.float32
    algo_opt_out = _small_algo(compute_dtype="bfloat16", store_obs_bf16=False)
    traj_opt = algo_opt_out.rollout(
        algo_opt_out.init_state(jax.random.PRNGKey(0)), jax.random.PRNGKey(1), 4
    )
    assert traj_opt.obs.dtype == jnp.float32


def test_bfloat16_compute_path():
    """compute_dtype="bfloat16": trunk matmuls in bf16, params/optimizer/
    distribution/loss math float32; training stays finite and close to the
    f32 run at init (heads cast back to f32, models/actor_critic.py)."""
    algo_bf = _small_algo(compute_dtype="bfloat16")
    algo_f32 = _small_algo()
    ts = algo_f32.init_state(jax.random.PRNGKey(0))
    ts_bf = algo_bf.init_state(jax.random.PRNGKey(0))
    # same param pytree (init is f32 in both; dtype only affects compute)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        ts.actor_params, ts_bf.actor_params,
    )
    obs = jnp.ones((8, 110), jnp.float32)
    (mean_bf, _), _ = algo_bf.actor.apply(ts.actor_params, obs)
    (mean_f, _), _ = algo_f32.actor.apply(ts.actor_params, obs)
    assert mean_bf.dtype == jnp.float32  # head casts back to f32
    np.testing.assert_allclose(
        np.asarray(mean_bf), np.asarray(mean_f), atol=2e-2
    )
    v = algo_bf.value(ts.critic_params, jnp.ones((8, 440), jnp.float32))
    assert v.dtype == jnp.float32
    ts2, m = jax.jit(algo_bf.train_iteration)(ts_bf, jax.random.PRNGKey(1))
    for f in m:
        assert np.isfinite(float(f))
    # params stay float32 master weights
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree_util.tree_leaves(ts2.actor_params)
    )


def test_bfloat16_tracks_float32():
    """bf16 mixed precision must track the f32 run at matched RNG: the
    first iteration's losses/metrics agree within bf16 rounding tolerance,
    params move, and everything stays finite. (Toy-scale runs carry no
    reliable *learning* signal in either dtype; full-scale bf16 learning
    is validated on TPU — default 200-iter config reaches final coverage
    0.79, inside the reference/f32 seed band, see README.)"""
    base = dict(n_rollout_threads=8, episode_length=40, ppo_epoch=5, n_iters=12)
    out = {}
    for dtype in ("float32", "bfloat16"):
        cfg = MAPPOConfig(compute_dtype=dtype, **base)
        algo = MAPPO(cfg, ENV)
        ts = algo.init_state(jax.random.PRNGKey(0))
        ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
        out[dtype] = (ts, ts2, m)
    (_, ts2_b, m_b), (_, _, m_f) = out["bfloat16"], out["float32"]
    for field in ("reward", "value_loss", "policy_loss", "dist_entropy", "ratio"):
        b, f = float(getattr(m_b, field)), float(getattr(m_f, field))
        assert np.isfinite(b)
        # bf16 has ~3 decimal digits; losses are O(1..100)
        assert abs(b - f) <= 0.05 * max(1.0, abs(f)), (field, b, f)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        out["bfloat16"][0].actor_params,
        ts2_b.actor_params,
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_proper_time_limits_end_to_end():
    """use_proper_time_limits + env time_limit: the rollout produces
    bad_masks (0 at truncations, 1 at real dones), compute_returns consumes
    them (VERDICT r1: the flag used to be accepted-but-ignored), and the
    update runs. With an episode shorter than the rollout window every env
    truncates at t=max_ep_len."""
    env = ENV._replace(max_ep_len=5, time_limit=True)
    cfg = MAPPOConfig(
        n_rollout_threads=3, episode_length=12, ppo_epoch=1, n_iters=5,
        hidden_size=16, use_proper_time_limits=True,
    )
    algo = MAPPO(cfg, env)
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda t, k: algo.rollout(t, k, 3))(ts, jax.random.PRNGKey(2))
    bad = np.asarray(traj.bad_masks)
    masks = np.asarray(traj.masks)
    # zero-velocity-ish random policy never leaves bounds in 5 steps, so all
    # boundaries here are truncations: mask==bad==0 at t=5 and t=10
    assert (bad[5] == 0).all() and (bad[10] == 0).all()
    assert (masks[5] == 0).all()
    assert bad[1:5].all() and bad[6:10].all()
    adv, ret = algo.compute_returns(ts, traj)
    # truncation stops credit: gae at the step before a truncation is
    # delta only; returns remain finite
    assert np.isfinite(np.asarray(ret)).all()
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(3))
    assert np.isfinite(float(m.value_loss))
    # flag off on the same env: bad_masks all ones in compute (still stored),
    # GAE differs at truncation boundaries
    algo_off = MAPPO(cfg._replace(use_proper_time_limits=False), env)
    adv_off, _ = algo_off.compute_returns(ts, traj)
    assert not np.allclose(np.asarray(adv), np.asarray(adv_off))


@pytest.mark.parametrize(
    "mode,act_width,logp_width",
    [
        ("multi_discrete", 2, 2),
        ("multi_binary", 4, 1),
        ("mixed", 3, 1),
    ],
)
def test_action_head_modes_rollout_and_update(mode, act_width, logp_width):
    """ACTLayer multi-space parity (act.py:19-41; VERDICT r1 item #7):
    MultiDiscrete / MultiBinary / mixed action heads each drive a rollout +
    PPO update end-to-end on the coverage env's matching action decode."""
    env = ENV._replace(action_mode=mode)
    cfg = MAPPOConfig(
        n_rollout_threads=3, episode_length=8, ppo_epoch=2, n_iters=5,
        hidden_size=24,
    )
    algo = MAPPO(cfg, env)
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda t, k: algo.rollout(t, k, 3))(ts, jax.random.PRNGKey(1))
    assert traj.actions.shape == (8, 3, 4, act_width)
    assert traj.log_probs.shape == (8, 3, 4, logp_width)
    a = np.asarray(traj.actions)
    if mode == "multi_discrete":
        assert set(np.unique(a)).issubset({0.0, 1.0, 2.0})
    elif mode == "multi_binary":
        assert set(np.unique(a)).issubset({0.0, 1.0})
    else:  # mixed: last column is the discrete throttle index
        assert set(np.unique(a[..., 2])).issubset({0.0, 1.0, 2.0})
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(2))
    assert np.isfinite(float(m.value_loss))
    assert abs(float(m.ratio) - 1.0) < 0.2  # on-policy first epochs
    diff = jax.tree_util.tree_map(
        lambda x, y: float(jnp.abs(x - y).max()), ts.actor_params, ts2.actor_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


def test_action_head_deterministic_modes():
    """Deterministic (eval) action = mode of each head family."""
    from dcc_tpu.models import distributions as D

    key = jax.random.PRNGKey(0)
    # multi_discrete: argmax per branch
    out = (jnp.asarray([[0.0, 3.0, -1.0]]), jnp.asarray([[2.0, -1.0, 0.5]]))
    a, lp = D.sample_head(key, "multi_discrete", out, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), [[1.0, 0.0]])
    assert lp.shape == (1, 2)
    # multi_binary: logits > 0
    a, lp = D.sample_head(key, "multi_binary", jnp.asarray([[1.0, -2.0, 0.5, -0.1]]),
                          deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), [[1.0, 0.0, 1.0, 0.0]])
    assert lp.shape == (1, 1)
    # mixed: (mean, argmax)
    out = ((jnp.asarray([[0.3, -0.2]]), jnp.zeros((2,))), jnp.asarray([[0.1, 5.0, -1.0]]))
    a, lp = D.sample_head(key, "mixed", out, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), [[0.3, -0.2, 1.0]], atol=1e-6)
    assert lp.shape == (1, 1)
    # evaluate matches sample log-probs for the sampled action
    for kind, out_ in (
        ("multi_binary", jnp.asarray([[1.0, -2.0, 0.5, -0.1]])),
        ("mixed", ((jnp.asarray([[0.3, -0.2]]), jnp.zeros((2,))),
                   jnp.asarray([[0.1, 5.0, -1.0]]))),
    ):
        a, lp = D.sample_head(key, kind, out_, deterministic=False)
        lp2, ent = D.evaluate_head(kind, out_, a)
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lp2), atol=1e-6)
        assert np.isfinite(np.asarray(ent)).all()


def test_update_chunks_matches_single_pass():
    """Gradient accumulation (update_chunks) must reproduce the single-pass
    update: the batch mean is the equal-weight mean of chunk means, so one
    full train iteration yields the same params up to float reassociation."""
    base = dict(n_rollout_threads=4, episode_length=10, ppo_epoch=3, n_iters=5,
                hidden_size=24)
    outs = []
    for chunks in (1, 5):
        cfg = MAPPOConfig(update_chunks=chunks, **base)
        algo = MAPPO(cfg, ENV)
        ts = algo.init_state(jax.random.PRNGKey(0))
        ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
        outs.append((ts2, m))
    (ts1, m1), (ts5, m5) = outs
    for a, b in zip(
        jax.tree_util.tree_leaves(ts1.actor_params),
        jax.tree_util.tree_leaves(ts5.actor_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(ts1.critic_params),
        jax.tree_util.tree_leaves(ts5.critic_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    np.testing.assert_allclose(
        float(m1.value_loss), float(m5.value_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1.actor_grad_norm), float(m5.actor_grad_norm), rtol=1e-4
    )


def test_update_chunks_guards():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        MAPPO(MAPPOConfig(update_chunks=2, num_mini_batch=2), ENV)
    with _pytest.raises(NotImplementedError):
        MAPPO(MAPPOConfig(update_chunks=2, use_recurrent_policy=True), ENV)


def test_env_dtype_float64_fidelity_mode():
    """env_dtype='float64' (the reference's numpy-f64-physics /
    torch-f32-nets split): the rollout runs the env in f64, casts at the
    net boundary, and stores the trajectory float32 like the reference's
    np.float32 buffer — and a train iteration runs end to end. (conftest
    enables x64, which this mode requires.)"""
    cfg = MAPPOConfig(
        n_rollout_threads=4, episode_length=8, ppo_epoch=1, n_iters=2,
        env_dtype="float64",
    )
    algo = MAPPO(cfg, ENV)
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = jax.jit(lambda ts, k: algo.rollout(ts, k, 4))(
        ts, jax.random.PRNGKey(1)
    )
    assert traj.obs.dtype == jnp.float32
    assert traj.rewards.dtype == jnp.float32
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(2))
    assert np.isfinite(float(m.reward))
    # f32 env mode is the default and unchanged
    algo32 = MAPPO(MAPPOConfig(n_rollout_threads=4, episode_length=8,
                               ppo_epoch=1), ENV)
    assert algo32._env_dtype == jnp.float32
