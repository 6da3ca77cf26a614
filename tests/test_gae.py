"""GAE / returns parity vs a direct numpy transcription of the reference's
reverse loops (shared_buffer.py:161-217)."""

import jax.numpy as jnp
import numpy as np

from dcc_tpu.ops import compute_gae, discounted_returns


def _ref_gae(rewards, values, masks, gamma, lam):
    T = rewards.shape[0]
    returns = np.zeros_like(rewards)
    gae = np.zeros_like(rewards[0])
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * lam * masks[t + 1] * gae
        returns[t] = gae + values[t]
    return returns


def test_gae_matches_reference_loop():
    rng = np.random.RandomState(0)
    T, E = 20, 5
    rewards = rng.randn(T, E, 1)
    values = rng.randn(T + 1, E, 1)
    masks = (rng.rand(T + 1, E, 1) > 0.2).astype(np.float64)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks), 0.99, 0.95
    )
    ref = _ref_gae(rewards, values, masks, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(ret), ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(adv), ref - values[:-1], atol=1e-10)


def test_gae_no_termination_telescopes():
    # with masks all 1 and lambda=1, returns = discounted reward sums + bootstrap
    T = 10
    rewards = np.ones((T, 1, 1))
    values = np.zeros((T + 1, 1, 1))
    values[-1] = 2.0
    masks = np.ones((T + 1, 1, 1))
    _, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks), 0.9, 1.0
    )
    expected = sum(0.9**k for k in range(T)) + 0.9**T * 2.0
    np.testing.assert_allclose(float(ret[0, 0, 0]), expected, rtol=1e-8)


def test_mask_cuts_bootstrap():
    # episode ends at t=4 (mask[5]=0): return at t<=4 ignores later rewards
    T = 10
    rewards = np.ones((T, 1, 1))
    values = np.zeros((T + 1, 1, 1))
    masks = np.ones((T + 1, 1, 1))
    masks[5] = 0.0
    _, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks), 0.9, 1.0
    )
    expected_t4 = 1.0  # r_4 only; nothing bootstraps past the boundary
    np.testing.assert_allclose(float(ret[4, 0, 0]), expected_t4, rtol=1e-8)


def test_discounted_returns_reference_loop():
    rng = np.random.RandomState(1)
    T = 15
    rewards = rng.randn(T, 3, 1)
    masks = (rng.rand(T + 1, 3, 1) > 0.1).astype(np.float64)
    next_v = rng.randn(3, 1)
    ret = discounted_returns(jnp.asarray(rewards), jnp.asarray(next_v), jnp.asarray(masks), 0.99)
    ref = np.zeros_like(rewards)
    r_next = next_v
    for t in reversed(range(T)):
        r_next = rewards[t] + 0.99 * masks[t + 1] * r_next
        ref[t] = r_next
    np.testing.assert_allclose(np.asarray(ret), ref, atol=1e-10)


def _ref_gae_bad(rewards, values, masks, bad_masks, gamma, lam):
    """use_proper_time_limits GAE branch (shared_buffer.py:169-185)."""
    T = rewards.shape[0]
    returns = np.zeros_like(rewards)
    gae = np.zeros_like(rewards[0])
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * values[t + 1] * masks[t + 1] - values[t]
        gae = delta + gamma * lam * masks[t + 1] * gae
        gae = gae * bad_masks[t + 1]
        returns[t] = gae + values[t]
    return returns


def test_gae_bad_masks_matches_reference_loop():
    rng = np.random.RandomState(3)
    T, E = 18, 4
    rewards = rng.randn(T, E, 1)
    values = rng.randn(T + 1, E, 1)
    masks = (rng.rand(T + 1, E, 1) > 0.2).astype(np.float64)
    # truncations are a subset of boundaries: bad=0 implies mask=0
    bad = np.where((masks == 0) & (rng.rand(T + 1, E, 1) > 0.5), 0.0, 1.0)
    adv, ret = compute_gae(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(masks),
        0.99, 0.95, bad_masks=jnp.asarray(bad),
    )
    ref = _ref_gae_bad(rewards, values, masks, bad, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(ret), ref, atol=1e-10)


def test_discounted_returns_bad_masks_matches_reference_loop():
    """shared_buffer.py:186-196: truncated steps fall back to V(s_t)."""
    rng = np.random.RandomState(4)
    T, E = 15, 3
    rewards = rng.randn(T, E, 1)
    values = rng.randn(T + 1, E, 1)
    masks = (rng.rand(T + 1, E, 1) > 0.25).astype(np.float64)
    bad = np.where((masks == 0) & (rng.rand(T + 1, E, 1) > 0.5), 0.0, 1.0)
    ret = discounted_returns(
        jnp.asarray(rewards), jnp.asarray(values[-1]), jnp.asarray(masks),
        0.99, bad_masks=jnp.asarray(bad), values=jnp.asarray(values[:-1]),
    )
    ref = np.zeros_like(rewards)
    nxt = values[-1]
    for t in reversed(range(T)):
        ref[t] = bad[t + 1] * (0.99 * masks[t + 1] * nxt + rewards[t]) + (
            1.0 - bad[t + 1]
        ) * values[t]
        nxt = ref[t]
    np.testing.assert_allclose(np.asarray(ret), ref, atol=1e-10)
