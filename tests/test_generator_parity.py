"""num_mini_batch>1 pairing vs a numpy transcription of the reference's
``feed_forward_generator`` (``/root/reference/uav_dcc_control/buffer/
shared_buffer.py:219-279``).

The reference flattens every buffer field C-order over (time, env, agent)
— with the critic-side fields (share_obs, value_preds, returns, masks)
stored per-agent, i.e. the env row duplicated across agents — draws ONE
permutation of the T*E*A row indices per epoch, and slices it into
``num_mini_batch`` contiguous index blocks; every field of a minibatch is
gathered with the same block (``shared_buffer.py:239-256``), keeping actor
and critic samples index-aligned.

dcc_tpu's ``MAPPO._ff_rows`` + the per-epoch permutation in ``update()``
must reproduce exactly that pairing. Verified two ways:

* **row-set identity** — the transcribed generator and ``_ff_rows`` gathered
  with the same permutation yield bit-identical minibatches for every field;
* **one-epoch update identity** — driving ``_ff_minibatch_update``
  sequentially with the *transcribed* generator's minibatches reproduces
  ``update()``'s post-epoch parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dcc_tpu.algos import MAPPO, MAPPOConfig
from dcc_tpu.envs import EnvConfig


def _reference_feed_forward_generator(buffers, rand, num_mini_batch):
    """Numpy transcription of shared_buffer.feed_forward_generator
    (:219-279): same flatten order, same sampler slicing, same [:-1] row
    windows. ``buffers`` uses the reference storage layout — obs/share_obs/
    value_preds/returns/masks shaped (T+1, E, A, .), actions/log_probs/
    advantages (T, E, A, .)."""
    T, E, A = buffers["actions"].shape[:3]
    batch_size = T * E * A
    mini_batch_size = batch_size // num_mini_batch
    sampler = [
        rand[i * mini_batch_size : (i + 1) * mini_batch_size]
        for i in range(num_mini_batch)
    ]
    share_obs = buffers["share_obs"][:-1].reshape(
        -1, *buffers["share_obs"].shape[3:]
    )
    obs = buffers["obs"][:-1].reshape(-1, *buffers["obs"].shape[3:])
    actions = buffers["actions"].reshape(-1, buffers["actions"].shape[-1])
    value_preds = buffers["value_preds"][:-1].reshape(-1, 1)
    returns = buffers["returns"][:-1].reshape(-1, 1)
    masks = buffers["masks"][:-1].reshape(-1, 1)
    logp = buffers["action_log_probs"].reshape(
        -1, buffers["action_log_probs"].shape[-1]
    )
    adv = buffers["advantages"].reshape(-1, 1)
    for indices in sampler:
        # field order matches MAPPO._ff_rows
        yield (
            obs[indices],
            actions[indices],
            logp[indices],
            adv[indices],
            share_obs[indices],
            value_preds[indices],
            returns[indices],
            masks[indices],
        )


def _reference_layout_buffers(traj, adv_n, returns):
    """Rebuild the reference's per-agent buffer storage from our Trajectory:
    the reference stores share_obs/value_preds/returns/masks per agent
    (identical env rows duplicated across the agent axis — the critic input
    is the same team concat for every agent, learner.py:218-224)."""
    obs = np.asarray(traj.obs)  # (T+1, E, A, D)
    Tp1, E, A, D = obs.shape
    T = Tp1 - 1
    cent = obs.reshape(Tp1, E, A * D)
    dup = lambda x: np.repeat(np.asarray(x)[:, :, None, :], A, axis=2)
    pad_t = lambda x: np.concatenate([x, np.zeros_like(x[:1])], axis=0)
    return {
        "obs": obs,
        "share_obs": dup(cent),
        "actions": np.asarray(traj.actions),
        "action_log_probs": np.asarray(traj.log_probs),
        # reference stores (T+1, ...); generator reads [:-1]
        "value_preds": dup(np.asarray(traj.values)),
        "returns": pad_t(dup(returns)),
        "masks": dup(np.asarray(traj.masks)),
        "advantages": dup(adv_n),
    }


def _setup(num_mini_batch=2, ppo_epoch=1):
    cfg = MAPPOConfig(
        n_rollout_threads=4,
        episode_length=6,
        ppo_epoch=ppo_epoch,
        num_mini_batch=num_mini_batch,
        hidden_size=32,
        n_iters=5,
    )
    algo = MAPPO(cfg, EnvConfig())
    ts = algo.init_state(jax.random.PRNGKey(0))
    traj = algo.rollout(ts, jax.random.PRNGKey(1), cfg.n_rollout_threads)
    adv, returns = algo.compute_returns(ts, traj)
    # the advantage normalization update() applies before minibatching
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-5)
    return algo, ts, traj, adv, adv_n, returns


def test_row_sets_match_reference_generator():
    algo, ts, traj, adv, adv_n, returns = _setup(num_mini_batch=3)
    T, E, A, _ = traj.actions.shape
    B = T * E * A
    key = jax.random.PRNGKey(7)
    key_e = jax.random.split(key, algo.cfg.ppo_epoch)[0]
    rand = np.asarray(jax.random.permutation(key_e, B))  # update()'s perm

    rows = algo._ff_rows(traj, adv_n, returns)
    bufs = _reference_layout_buffers(traj, np.asarray(adv_n), np.asarray(returns))
    mb = B // algo.cfg.num_mini_batch
    for i, ref_mb in enumerate(
        _reference_feed_forward_generator(bufs, rand, algo.cfg.num_mini_batch)
    ):
        idx = rand[i * mb : (i + 1) * mb]
        for got_field, want_field in zip(rows, ref_mb):
            np.testing.assert_array_equal(
                np.asarray(got_field[idx]), want_field
            )


def test_one_epoch_update_matches_reference_generator():
    algo, ts, traj, adv, adv_n, returns = _setup(num_mini_batch=2, ppo_epoch=1)
    T, E, A, _ = traj.actions.shape
    B = T * E * A
    key = jax.random.PRNGKey(7)

    ts2, _ = jax.jit(algo.update)(ts, key, traj, adv, returns)

    # drive the real minibatch step with the TRANSCRIBED generator's batches
    key_e = jax.random.split(key, 1)[0]
    rand = np.asarray(jax.random.permutation(key_e, B))
    bufs = _reference_layout_buffers(traj, np.asarray(adv_n), np.asarray(returns))
    carry = (
        ts.actor_params,
        ts.critic_params,
        ts.actor_opt,
        ts.critic_opt,
        ts.vnorm,
        ts.popart,
        ts.update_count,
    )
    for ref_mb in _reference_feed_forward_generator(bufs, rand, 2):
        carry, _ = algo._ff_minibatch_update(
            carry, tuple(jnp.asarray(x) for x in ref_mb)
        )
    got_actor, got_critic = carry[0], carry[1]
    for got, want in zip(
        jax.tree_util.tree_leaves((got_actor, got_critic)),
        jax.tree_util.tree_leaves((ts2.actor_params, ts2.critic_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )
