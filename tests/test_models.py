"""Model-stack tests: shapes, init scheme, distribution math vs closed form,
ValueNorm/PopArt numerics vs the reference's update equations."""

import jax
import jax.numpy as jnp
import numpy as np

from dcc_tpu.models import Actor, Critic, MaskedGRU, MLPBase
from dcc_tpu.models import distributions as D
from dcc_tpu.models import popart as PA
from dcc_tpu.models import valuenorm as VN

F32 = jnp.float32


def test_actor_shapes_and_init():
    actor = Actor(action_dim=2)
    obs = jnp.zeros((8, 110), F32)
    params = actor.init(jax.random.PRNGKey(0), obs)
    (mean, log_std), _ = actor.apply(params, obs)
    assert mean.shape == (8, 2) and log_std.shape == (2,)
    # log_std initialized to zero (reference AddBias zeros, distributions.py:82)
    np.testing.assert_array_equal(np.asarray(log_std), 0.0)
    # head kernel orthogonal with gain 0.01 -> tiny norm
    k = params["params"]["act_out"]["kernel"]
    assert float(jnp.abs(k).max()) < 0.01


def test_mlp_orthogonal_columns():
    m = MLPBase(hidden_size=64, layer_n=1)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    k = np.asarray(p["params"]["fc0"]["kernel"], dtype=np.float64)  # (32, 64)
    # rows of torch's (out,in) == columns here; orthogonal with gain sqrt(2):
    # K K^T = 2 I on the smaller side
    gram = k @ k.T
    np.testing.assert_allclose(gram, 2.0 * np.eye(32), atol=1e-4)


def test_critic_value_head_gain_one():
    c = Critic(hidden_size=64)
    p = c.init(jax.random.PRNGKey(0), jnp.zeros((1, 440)))
    v, _ = c.apply(p, jnp.ones((3, 440), F32))
    assert v.shape == (3, 1)
    k = np.asarray(p["params"]["v_out"]["kernel"], dtype=np.float64)
    np.testing.assert_allclose(float((k**2).sum()), 1.0, atol=1e-5)  # unit norm column


def test_normal_log_prob_matches_scipy_form():
    mean = jnp.array([[0.3, -0.2]], F32)
    log_std = jnp.array([0.1, -0.5], F32)
    a = jnp.array([[0.5, 0.1]], F32)
    lp = D.normal_log_prob(mean, log_std, a)
    std = np.exp(np.array([0.1, -0.5]))
    ref = -0.5 * ((np.array([0.5, 0.1]) - np.array([0.3, -0.2])) / std) ** 2 \
        - np.log(std) - 0.5 * np.log(2 * np.pi)
    np.testing.assert_allclose(float(lp[0, 0]), ref.sum(), rtol=1e-5)


def test_normal_entropy_closed_form():
    log_std = jnp.array([0.0, 1.0], F32)
    ent = D.normal_entropy(log_std, jnp.zeros((4, 2), F32))
    ref = 0.5 + 0.5 * np.log(2 * np.pi) + np.array([0.0, 1.0])
    np.testing.assert_allclose(np.asarray(ent[0]), ref, rtol=1e-6)


def test_normal_sample_statistics():
    key = jax.random.PRNGKey(0)
    mean = jnp.full((20000, 1), 2.0, F32)
    log_std = jnp.array([np.log(0.5)], F32)
    a = D.normal_sample(key, mean, log_std)
    assert abs(float(a.mean()) - 2.0) < 0.02
    assert abs(float(a.std()) - 0.5) < 0.02


def test_categorical_roundtrip():
    logits = jnp.array([[0.0, 2.0, -1.0]], F32)
    a = D.categorical_mode(logits)
    assert int(a[0, 0]) == 1
    lp = D.categorical_log_prob(logits, a)
    ref = 2.0 - np.log(np.exp(0.0) + np.exp(2.0) + np.exp(-1.0))
    np.testing.assert_allclose(float(lp[0, 0]), ref, rtol=1e-4)
    masked = D.categorical_mask(logits, jnp.array([[1.0, 0.0, 1.0]]))
    assert int(D.categorical_mode(masked)[0, 0]) == 0


def test_valuenorm_matches_reference_equations():
    """Direct transcription of utils/valuenorm.py:38-77 in numpy."""
    rng = np.random.RandomState(0)
    st = VN.init(dtype=jnp.float64)
    mean = np.zeros(1)
    mean_sq = np.zeros(1)
    debias = 0.0
    beta = 0.99999
    for _ in range(5):
        batch = rng.randn(64, 1) * 3 + 7
        st = VN.update(st, jnp.asarray(batch))
        bm, bsq = batch.mean(0), (batch**2).mean(0)
        mean = mean * beta + bm * (1 - beta)
        mean_sq = mean_sq * beta + bsq * (1 - beta)
        debias = debias * beta + (1 - beta)
    dm = mean / np.clip(debias, 1e-5, None)
    dmsq = mean_sq / np.clip(debias, 1e-5, None)
    dvar = np.clip(dmsq - dm**2, 1e-2, None)
    x = rng.randn(8, 1)
    np.testing.assert_allclose(
        np.asarray(VN.normalize(st, jnp.asarray(x))), (x - dm) / np.sqrt(dvar), rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(VN.denormalize(st, jnp.asarray(x))), x * np.sqrt(dvar) + dm, rtol=1e-8
    )


def test_popart_preserves_unnormalized_output():
    """After update-and-rescale, head(features) mapped through the raw EMA
    stats is unchanged: new_head(x)*new_std + new_mean == old_head(x)*old_std
    + old_mean (the PopArt invariant, popart.py:62-66; note the reference
    rescales with the *raw* EMA mean/stddev, not the debiased stats used by
    normalize/denormalize)."""
    rng = np.random.RandomState(0)
    st = PA.init(dtype=jnp.float64)
    kernel = jnp.asarray(rng.randn(16, 1))
    bias = jnp.asarray(rng.randn(1))
    feats = jnp.asarray(rng.randn(4, 16))
    before = (feats @ kernel + bias) * st.stddev + st.mean
    batch = jnp.asarray(rng.randn(32, 1) * 5 + 2)
    st2, k2, b2 = PA.update(st, kernel, bias, batch)
    after = (feats @ k2 + b2) * st2.stddev + st2.mean
    np.testing.assert_allclose(np.asarray(after), np.asarray(before), rtol=1e-8)


def test_masked_gru_resets_hidden():
    gru = MaskedGRU(hidden_size=16)
    x = jnp.ones((2, 16), F32)
    h = jnp.ones((2, 1, 16), F32)
    params = gru.init(jax.random.PRNGKey(0), x, h, jnp.ones((2, 1), F32))
    out_keep, h_keep = gru.apply(params, x, h, jnp.ones((2, 1), F32))
    out_reset, h_reset = gru.apply(params, x, h, jnp.zeros((2, 1), F32))
    out_zero, h_zero = gru.apply(params, x, jnp.zeros_like(h), jnp.ones((2, 1), F32))
    # masked call == call with zero hidden
    np.testing.assert_allclose(np.asarray(out_reset), np.asarray(out_zero), atol=1e-6)
    assert not np.allclose(np.asarray(out_keep), np.asarray(out_reset))


def test_masked_gru_sequence_equals_stepwise():
    gru = MaskedGRU(hidden_size=8)
    T, B = 5, 3
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, 8))
    masks = jnp.ones((T, B, 1)).at[2, 1].set(0.0)
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 8))
    params = gru.init(jax.random.PRNGKey(0), xs[0], h0, masks[0])
    outs_seq, h_seq = gru.apply(params, xs, h0, masks, method=MaskedGRU.sequence)
    h = h0
    outs = []
    for t in range(T):
        o, h = gru.apply(params, xs[t], h, masks[t])
        outs.append(o)
    np.testing.assert_allclose(np.asarray(outs_seq), np.stack(outs), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_seq), np.asarray(h), atol=1e-5)
