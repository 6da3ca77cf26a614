"""The fused Pallas GAE kernel must match the lax.scan reference exactly.

Runs in Pallas interpret mode on the CPU test platform; the same kernel is
compiled by Mosaic on TPU (exercised by bench.py / scripts under the real
chip). Shapes cover non-128-multiple batch lanes (grid remainder masking)
and mid-episode done masks (carry resets through m=0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcc_tpu.ops import compute_gae, compute_gae_pallas


@pytest.mark.parametrize(
    "T,trailing",
    [
        (150, (16, 4, 1)),  # default run shape
        (7, (3, 1)),        # tiny, B=3 << one lane tile
        (33, (130, 5, 1)),  # B=650: grid of 2 with ragged last block
    ],
)
def test_pallas_gae_matches_scan(T, trailing):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rewards = jax.random.normal(k1, (T,) + trailing, jnp.float32)
    values = jax.random.normal(k2, (T + 1,) + trailing, jnp.float32)
    masks = (jax.random.uniform(k3, (T + 1,) + trailing) > 0.2).astype(jnp.float32)

    adv_ref, ret_ref = compute_gae(rewards, values, masks, 0.99, 0.95)
    adv, ret = compute_gae_pallas(
        rewards, values, masks, 0.99, 0.95, block_b=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(adv), np.asarray(adv_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(ret_ref), atol=1e-5)


def test_pallas_gae_broadcast_values():
    # separated-policy path: values may broadcast against rewards
    T = 12
    rewards = jnp.ones((T, 8, 4, 1))
    values = jnp.linspace(0, 1, T + 1).reshape(T + 1, 1, 1, 1) * jnp.ones((1, 8, 4, 1))
    masks = jnp.ones((T + 1, 8, 4, 1))
    adv_ref, ret_ref = compute_gae(rewards, values, masks, 0.99, 0.95)
    adv, ret = compute_gae_pallas(rewards, values, masks, 0.99, 0.95, interpret=True)
    np.testing.assert_allclose(np.asarray(adv), np.asarray(adv_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(ret_ref), atol=1e-5)
