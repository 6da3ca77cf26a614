"""Fused PPO loss+gradient kernels (ops/fused_ppo) vs jax.grad of the stock
flax loss — interpreter mode on CPU.

The kernels compute SUM-reduced losses and parameter gradients directly
(no autodiff); these tests assert exact structural agreement and tight
numerical agreement against ``jax.value_and_grad`` of the same loss built
from the flax Actor/Critic modules (the `_ff_minibatch_update` math).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.models.actor_critic import Actor, Critic
from dcc_tpu.models import distributions as D
from dcc_tpu.ops.fused_ppo import actor_ppo_grads, critic_value_grads

CLIP = 0.2
DELTA = 10.0


def _flat_trunk(base, n_layers, use_fn=True):
    flat = []
    if use_fn:
        flat += [base["feature_norm"]["scale"], base["feature_norm"]["bias"]]
    for i in range(n_layers):
        flat += [
            base[f"fc{i}"]["kernel"],
            base[f"fc{i}"]["bias"],
            base[f"norm{i}"]["scale"],
            base[f"norm{i}"]["bias"],
        ]
    return flat


def _setup_actor(rows=70, din=110, hidden=64, act_dim=2):
    actor = Actor(hidden_size=hidden, layer_n=1, action_dim=act_dim)
    k = jax.random.PRNGKey(0)
    obs = jax.random.normal(k, (rows, din), jnp.float32)
    params = actor.init(jax.random.PRNGKey(1), obs)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    act = jax.random.normal(k1, (rows, act_dim), jnp.float32)
    adv = jax.random.normal(k2, (rows, 1), jnp.float32)
    # old log-probs near the current ones (ratio ~ 1, some rows clipped)
    out, _ = actor.apply(params, obs)
    lp, _ = D.evaluate_head("gaussian", out, act)
    old_lp = lp + 0.3 * jax.random.normal(k3, (rows, 1), jnp.float32)
    return actor, params, obs, act, old_lp, adv


def _actor_loss_flax(actor, params, obs, act, old_lp, adv):
    out, _ = actor.apply(params, obs)
    new_lp, _ = D.evaluate_head("gaussian", out, act)
    ratio = jnp.exp(new_lp - old_lp)
    s1 = ratio * adv
    s2 = jnp.clip(ratio, 1.0 - CLIP, 1.0 + CLIP) * adv
    loss = -jnp.sum(jnp.minimum(s1, s2), axis=-1, keepdims=True).sum()
    return loss, ratio.sum()


@pytest.mark.parametrize("fold", [False, True])
def test_actor_grads_match_autodiff(fold):
    actor, params, obs, act, old_lp, adv = _setup_actor()
    (loss_ref, ratio_ref), grads_ref = jax.value_and_grad(
        lambda p: _actor_loss_flax(actor, p, obs, act, old_lp, adv),
        has_aux=True,
    )(params)

    p = params["params"]
    trunk = _flat_trunk(p["base"], 2)
    tg, dwh, dbh, dls, met = actor_ppo_grads(
        obs, act, old_lp, adv, trunk, p["act_out"]["kernel"],
        p["act_out"]["bias"], p["log_std"],
        n_layers=2, clip_param=CLIP, block_rows=32, interpret=True, fold=fold,
    )
    np.testing.assert_allclose(float(met[0]), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(met[1]), float(ratio_ref), rtol=1e-5)

    gr = grads_ref["params"]
    want_trunk = _flat_trunk(gr["base"], 2)
    for got, want in zip(tg, want_trunk):
        np.testing.assert_allclose(
            np.asarray(got).reshape(np.asarray(want).shape),
            np.asarray(want),
            rtol=2e-4,
            atol=5e-5,
        )
    np.testing.assert_allclose(
        np.asarray(dwh), np.asarray(gr["act_out"]["kernel"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dbh), np.asarray(gr["act_out"]["bias"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dls), np.asarray(gr["log_std"]), rtol=2e-4, atol=2e-5
    )


def _setup_critic(rows=70, sdim=440, hidden=64):
    critic = Critic(hidden_size=hidden, layer_n=1)
    k = jax.random.PRNGKey(3)
    cent = jax.random.normal(k, (rows, sdim), jnp.float32)
    params = critic.init(jax.random.PRNGKey(4), cent)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    v0, _ = critic.apply(params, cent)
    # vpred near current values (some rows inside / outside the clip range),
    # returns with large spread so both Huber branches trigger
    vpred = v0 + 0.3 * jax.random.normal(k1, (rows, 1), jnp.float32)
    ret = v0 + 30.0 * jax.random.normal(k2, (rows, 1), jnp.float32)
    return critic, params, cent, vpred, ret


def _huber(e):
    a = (jnp.abs(e) <= DELTA).astype(e.dtype)
    b = (e > DELTA).astype(e.dtype)
    return a * e**2 / 2.0 + b * DELTA * (jnp.abs(e) - DELTA / 2.0)


def _critic_loss_flax(critic, params, cent, vpred, ret, use_huber, use_clipped):
    v, _ = critic.apply(params, cent)
    lf = _huber if use_huber else (lambda e: e**2 / 2.0)
    err = ret - v
    if use_clipped:
        v_clip = vpred + jnp.clip(v - vpred, -CLIP, CLIP)
        loss = jnp.maximum(lf(err), lf(ret - v_clip))
    else:
        loss = lf(err)
    return loss.sum()


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize(
    "use_huber,use_clipped",
    [(True, True), (True, False), (False, True), (False, False)],
)
def test_critic_grads_match_autodiff(use_huber, use_clipped, fold):
    critic, params, cent, vpred, ret = _setup_critic()
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _critic_loss_flax(
            critic, p, cent, vpred, ret, use_huber, use_clipped
        )
    )(params)

    p = params["params"]
    trunk = _flat_trunk(p["base"], 2)
    tg, dwv, dbv, met = critic_value_grads(
        cent, vpred, ret, trunk, p["v_out"]["kernel"], p["v_out"]["bias"],
        n_layers=2, clip_param=CLIP, huber_delta=DELTA,
        use_huber=use_huber, use_clipped=use_clipped,
        block_rows=32, interpret=True, fold=fold,
    )
    np.testing.assert_allclose(float(met[0]), float(loss_ref), rtol=1e-5)
    gr = grads_ref["params"]
    for got, want in zip(tg, _flat_trunk(gr["base"], 2)):
        np.testing.assert_allclose(
            np.asarray(got).reshape(np.asarray(want).shape),
            np.asarray(want),
            rtol=2e-4,
            atol=5e-5,
        )
    np.testing.assert_allclose(
        np.asarray(dwv), np.asarray(gr["v_out"]["kernel"]), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(dbv), np.asarray(gr["v_out"]["bias"]), rtol=2e-4, atol=2e-5
    )


def test_actor_padding_invariance():
    """Results must not depend on the row padding (rows % block_rows != 0)."""
    actor, params, obs, act, old_lp, adv = _setup_actor(rows=50)
    p = params["params"]
    trunk = _flat_trunk(p["base"], 2)
    args = (obs, act, old_lp, adv, trunk, p["act_out"]["kernel"],
            p["act_out"]["bias"], p["log_std"])
    out1 = actor_ppo_grads(*args, n_layers=2, block_rows=32, interpret=True)
    out2 = actor_ppo_grads(*args, n_layers=2, block_rows=64, interpret=True)
    for a1, a2 in zip(jax.tree_util.tree_leaves(out1), jax.tree_util.tree_leaves(out2)):
        np.testing.assert_allclose(
            np.asarray(a1), np.asarray(a2), rtol=2e-5, atol=2e-6
        )


def test_critic_tie_convention_first_epoch():
    """At the first epoch v == vpred exactly (err == err_c everywhere):
    gradient must match autodiff's balanced-tie convention bit-for-bit in
    structure (0.5/0.5 split)."""
    critic, params, cent, _, ret = _setup_critic()
    v0, _ = critic.apply(params, cent)
    vpred = v0  # exact tie
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: _critic_loss_flax(critic, p, cent, vpred, ret, True, True)
    )(params)
    p = params["params"]
    tg, dwv, dbv, met = critic_value_grads(
        cent, vpred, ret, _flat_trunk(p["base"], 2),
        p["v_out"]["kernel"], p["v_out"]["bias"],
        n_layers=2, clip_param=CLIP, huber_delta=DELTA,
        use_huber=True, use_clipped=True, block_rows=32, interpret=True,
    )
    np.testing.assert_allclose(float(met[0]), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(dwv),
        np.asarray(grads_ref["params"]["v_out"]["kernel"]),
        rtol=2e-4,
        atol=2e-5,
    )


def test_fused_loss_integration_matches_stock():
    """fused_loss="interpret" train_iteration matches the stock autodiff
    path: same rollout (shared), near-identical post-update params."""
    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    env = EnvConfig()
    out = {}
    for mode in ("off", "interpret"):
        cfg = MAPPOConfig(
            n_rollout_threads=4,
            episode_length=8,
            ppo_epoch=2,
            n_iters=5,
            hidden_size=32,
            fused_loss=mode,
            fused_block_rows=32,
        )
        algo = MAPPO(cfg, env)
        ts = algo.init_state(jax.random.PRNGKey(0))
        ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
        out[mode] = (ts2, m)
    m_off, m_int = out["off"][1], out["interpret"][1]
    assert float(m_off.policy_loss) == pytest.approx(
        float(m_int.policy_loss), rel=1e-4, abs=1e-6
    )
    assert float(m_off.value_loss) == pytest.approx(
        float(m_int.value_loss), rel=1e-4
    )
    assert float(m_off.dist_entropy) == pytest.approx(
        float(m_int.dist_entropy), rel=1e-5
    )
    assert float(m_off.ratio) == pytest.approx(float(m_int.ratio), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(
            (out["off"][0].actor_params, out["off"][0].critic_params)
        ),
        jax.tree_util.tree_leaves(
            (out["interpret"][0].actor_params, out["interpret"][0].critic_params)
        ),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_loss_with_minibatches_and_popart():
    """fused_loss composes with num_mini_batch>1 and with PopArt (the
    normalizer update/rescale runs outside the kernels)."""
    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    for extra in (
        {"num_mini_batch": 2},
        {"use_popart": True, "use_valuenorm": False},
    ):
        outs = {}
        for mode in ("off", "interpret"):
            cfg = MAPPOConfig(
                n_rollout_threads=4,
                episode_length=8,
                ppo_epoch=2,
                n_iters=5,
                hidden_size=32,
                fused_loss=mode,
                fused_block_rows=32,
                **extra,
            )
            algo = MAPPO(cfg, EnvConfig())
            ts = algo.init_state(jax.random.PRNGKey(0))
            ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
            outs[mode] = (ts2, m)
        for a, b in zip(
            jax.tree_util.tree_leaves(outs["off"][0].actor_params),
            jax.tree_util.tree_leaves(outs["interpret"][0].actor_params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5
            ), extra


def test_fused_loss_dispatch_rules():
    """fused_loss resolution: auto is off on CPU, "on" requires the shared
    feed-forward gaussian single-device config, and chunking is bypassed
    when the kernels are active (the headline-config routing)."""
    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    env = EnvConfig()
    # auto resolves off on the CPU backend
    assert not MAPPO(MAPPOConfig(), env)._fused_loss
    # forcing works and bypasses update_chunks in update()'s routing
    algo = MAPPO(
        MAPPOConfig(fused_loss="interpret", update_chunks=2, fused_block_rows=32,
                    n_rollout_threads=4, episode_length=8, ppo_epoch=1,
                    hidden_size=32),
        env,
    )
    assert algo._fused_loss
    ts = algo.init_state(jax.random.PRNGKey(0))
    ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.policy_loss))
    # incompatible configs raise instead of silently degrading
    with pytest.raises(ValueError):
        MAPPO(MAPPOConfig(fused_loss="on", share_policy=False), env)
    with pytest.raises(ValueError):
        MAPPO(MAPPOConfig(fused_loss="on", use_recurrent_policy=True,
                          episode_length=150), env)
    with pytest.raises(ValueError):
        MAPPO(
            MAPPOConfig(fused_loss="on"),
            EnvConfig(discrete_actions=True),
        )
