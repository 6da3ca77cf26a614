"""Fused Pallas MLP trunk (ops/fused_mlp) vs the flax MLPBase path.

The kernel is validated in interpreter mode on CPU: forward equality,
custom-VJP gradient equality against autodiff of the flax graph (params and
input), row-padding correctness, bf16-mode agreement, and a full
train-iteration integration check (``fused_trunk="interpret"``) including
param-tree identity (checkpoint interop between the two execution paths).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.models.mlp import MLPBase
from dcc_tpu.ops.fused_mlp import fused_mlp


def _flat_params(params, n_layers, use_fn):
    flat = []
    if use_fn:
        flat += [params["feature_norm"]["scale"], params["feature_norm"]["bias"]]
    for i in range(n_layers):
        flat += [
            params[f"fc{i}"]["kernel"],
            params[f"fc{i}"]["bias"],
            params[f"norm{i}"]["scale"],
            params[f"norm{i}"]["bias"],
        ]
    return flat


def _setup(din=110, hidden=64, layer_n=1, use_fn=True, use_relu=True, rows=70):
    m = MLPBase(
        hidden_size=hidden,
        layer_n=layer_n,
        use_relu=use_relu,
        use_feature_normalization=use_fn,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, din), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    return m, x, params


@pytest.mark.parametrize(
    "din,use_fn,use_relu,rows",
    [(110, True, True, 70), (37, False, False, 64), (440, True, True, 33)],
)
def test_forward_matches_flax(din, use_fn, use_relu, rows):
    m, x, params = _setup(din=din, use_fn=use_fn, use_relu=use_relu, rows=rows)
    ref = m.apply({"params": params}, x)
    out = fused_mlp(
        x,
        _flat_params(params, 2, use_fn),
        n_layers=2,
        use_feature_norm=use_fn,
        use_relu=use_relu,
        block_rows=32,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_leading_dims():
    """(T, B, D) inputs flatten/unflatten transparently (sequence path)."""
    m, _, params = _setup()
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 13, 110), jnp.float32)
    ref = m.apply({"params": params}, x)
    out = fused_mlp(
        x, _flat_params(params, 2, True), n_layers=2, block_rows=32,
        interpret=True,
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("use_relu", [True, False])
def test_gradients_match_autodiff(use_relu):
    """Custom-VJP grads (params AND input) == autodiff of the flax graph."""
    m, x, params = _setup(use_relu=use_relu)
    w = jax.random.normal(jax.random.PRNGKey(3), (70, 64), jnp.float32)
    flat = _flat_params(params, 2, True)

    def loss_ref(p, x):
        return jnp.sum(m.apply({"params": p}, x) * w)

    def loss_fused(flat, x):
        return jnp.sum(
            fused_mlp(
                x, flat, n_layers=2, use_relu=use_relu, block_rows=32,
                interpret=True,
            )
            * w
        )

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(flat, x)
    for got, want in zip(gf_p, _flat_params(gr_p, 2, True)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
        )
    np.testing.assert_allclose(
        np.asarray(gf_x), np.asarray(gr_x), rtol=2e-4, atol=2e-5
    )


def test_bfloat16_mode_tracks_flax_bf16():
    m, x, params = _setup()
    m_bf = MLPBase(hidden_size=64, layer_n=1, dtype=jnp.bfloat16)
    ref = m_bf.apply({"params": params}, x.astype(jnp.bfloat16))
    out = fused_mlp(
        x.astype(jnp.bfloat16),
        _flat_params(params, 2, True),
        n_layers=2,
        bf16=True,
        block_rows=32,
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16
    # LN normalize runs in f32 with one output rounding, exactly like flax
    # (_ln_fwd); the residual gap is the Dense accumulation dtype (kernel:
    # f32 MXU accumulate; flax on-CPU interpret: bf16 chain) amplified
    # through the second LN's statistics — a few bf16 ULPs on O(1) outputs.
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    assert err.max() < 0.05, err.max()
    assert err.mean() < 0.005, err.mean()


def test_fused_module_param_tree_identical():
    """fused=True declares the exact same flax param tree (names, shapes,
    init values) as the stock path — checkpoints interoperate."""
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 110), jnp.float32)
    stock = MLPBase(hidden_size=64).init(jax.random.PRNGKey(5), x)["params"]
    fused = MLPBase(hidden_size=64, fused=True, fused_interpret=True,
                    fused_block_rows=32).init(jax.random.PRNGKey(5), x)["params"]
    assert jax.tree_util.tree_structure(stock) == jax.tree_util.tree_structure(
        fused
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(stock), jax.tree_util.tree_leaves(fused)
    ):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_iteration_fused_matches_flax():
    """End-to-end: one jitted train iteration with fused_trunk="interpret"
    matches the stock path (same init → near-identical post-update params)."""
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
            fused_trunk=mode,
        )
        algo = MAPPO(cfg, env)
        ts = algo.init_state(jax.random.PRNGKey(0))
        ts2, m = jax.jit(algo.train_iteration)(ts, jax.random.PRNGKey(1))
        out[mode] = (ts2, float(m.reward))
    assert jax.tree_util.tree_structure(
        out["off"][0].actor_params
    ) == jax.tree_util.tree_structure(out["interpret"][0].actor_params)
    # The fused forward differs from the flax schedule at f32-rounding
    # level (~1e-7 per action mean); the env dynamics amplify that over the
    # rollout, so trajectories (and hence rewards/updates) agree only
    # approximately. Tight numerical equality is asserted at the op level
    # (test_gradients_match_autodiff); here we check the integrated paths
    # stay on the same trajectory family.
    assert out["off"][1] == pytest.approx(out["interpret"][1], rel=5e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(out["off"][0].actor_params),
        jax.tree_util.tree_leaves(out["interpret"][0].actor_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3
        )


def test_clamp_block_rows_wide_inputs():
    """Width-aware tile clamp (round-5 fix): a fixed 6144-row tile at the
    20-UAV preset's 4840-wide centralized obs needs ~120 MB of scoped VMEM
    against Mosaic's 100 MB cap (observed compile OOM on hardware);
    clamp_block_rows bounds the width-sized staging to half the cap. The
    shipped default widths (110 actor / 440 critic) are never clamped."""
    from dcc_tpu.ops.fused_mlp import _VMEM_LIMIT, clamp_block_rows

    assert clamp_block_rows(6144, 110) == 6144
    assert clamp_block_rows(6144, 440) == 6144
    wide = clamp_block_rows(6144, 4840)
    assert wide < 6144 and wide >= 256 and wide % 256 == 0
    assert 3 * wide * 4840 * 4 <= _VMEM_LIMIT // 2
    # monotone + floor
    assert clamp_block_rows(6144, 100_000) == 256


def test_fused_mlp_wide_input_matches_flax_schedule():
    """The internally clamped tile is numerically identical to the unclamped
    kernel (grid decomposition only changes the tile loop): check the fused
    trunk on a wide (cent-obs-like) input against the plain-XLA schedule."""
    import jax
    import jax.numpy as jnp

    from dcc_tpu.ops.fused_mlp import fused_mlp

    d_in, hidden, rows = 1210, 32, 512
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    params = [
        jnp.ones((d_in,)),  # fn scale
        jnp.zeros((d_in,)),  # fn bias
        jax.random.normal(ks[0], (d_in, hidden)) * 0.05,
        jnp.zeros((hidden,)),
        jnp.ones((hidden,)),
        jnp.zeros((hidden,)),
        jax.random.normal(ks[1], (hidden, hidden)) * 0.05,
        jnp.zeros((hidden,)),
        jnp.ones((hidden,)),
        jnp.zeros((hidden,)),
    ]
    x = jax.random.normal(ks[2], (rows, d_in))
    out = fused_mlp(
        x, params, n_layers=2, use_feature_norm=True, use_relu=True,
        bf16=False, block_rows=6144, interpret=True,
    )

    def ln(v, s, b):  # flax semantics: fast-variance, eps 1e-6
        mu = v.mean(-1, keepdims=True)
        var = jnp.maximum((v * v).mean(-1, keepdims=True) - mu * mu, 0.0)
        return (v - mu) / jnp.sqrt(var + 1e-6) * s + b

    a = ln(x, params[0], params[1])
    for i in (2, 6):
        a = jnp.maximum(a @ params[i] + params[i + 1], 0)
        a = ln(a, params[i + 2], params[i + 3])
    import numpy as np

    np.testing.assert_allclose(np.asarray(out), np.asarray(a), atol=2e-4)
