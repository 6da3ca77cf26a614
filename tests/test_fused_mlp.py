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
