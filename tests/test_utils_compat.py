"""Tests for the L0 utils layer and the compat parity harness."""

import jax
import jax.numpy as jnp
import numpy as np

from dcc_tpu import compat
from dcc_tpu.utils import (
    global_grad_norm,
    huber_loss,
    linear_schedule,
    mse_loss,
    seed_all,
    tile_images,
)


def test_huber_mse_match_reference_shapes():
    # utils/util.py:36-43: huber = 0.5 e^2 inside delta, linear tail outside
    e = jnp.array([-25.0, -1.0, 0.0, 3.0, 40.0])
    h = huber_loss(e, 10.0)
    np.testing.assert_allclose(
        np.asarray(h), [10 * (25 - 5.0), 0.5, 0.0, 4.5, 10 * (40 - 5.0)]
    )
    np.testing.assert_allclose(np.asarray(mse_loss(e)), 0.5 * np.asarray(e) ** 2)


def test_linear_schedule_endpoints():
    sched = linear_schedule(5e-4, 200)
    assert float(sched(0)) == 5e-4
    np.testing.assert_allclose(float(sched(100)), 2.5e-4)
    assert float(sched(200)) == 0.0
    assert float(sched(500)) == 0.0  # clamped past the horizon


def test_grad_norm_and_seed():
    tree = {"a": jnp.ones((3,)), "b": 2.0 * jnp.ones((4,))}
    np.testing.assert_allclose(float(global_grad_norm(tree)), np.sqrt(3 + 16))
    key = seed_all(7)
    assert key.shape == (2,) or key.dtype == jax.dtypes.prng_key(  # typed or raw key
        "threefry2x32"
    )


def test_tile_images_grid():
    imgs = [np.full((4, 6, 3), i, np.uint8) for i in range(5)]
    out = tile_images(imgs)
    assert out.shape == (2 * 4, 3 * 6, 3)  # 5 -> 2x3 grid with padding
    assert (out[:4, :6] == 0).all() and (out[:4, 6:12] == 1).all()
    assert (out[4:, 12:] == 0).all()  # padded cell is black


def test_compat_harness_matches_golden():
    trace = compat.load_golden("default_4x20")
    diffs = compat.compare(trace)
    assert diffs["obs0"] < 1e-12
    assert diffs["obs"] < 1e-10
    assert diffs["reward"] < 1e-8
    assert diffs["done"] == 0.0
    assert diffs["coverage"] < 1e-12
    assert trace.shared_reward.shape == (trace.actions.shape[0],)
