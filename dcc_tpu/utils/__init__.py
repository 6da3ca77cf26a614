"""Shared utilities — TPU-native counterpart of the reference's L0 layer
(``utils/util.py``, ``utils/pytorch_utils.py``; SURVEY.md section 1/2 items
16-17).

What moved where in the new design:

* the global *device singleton* (``pytorch_utils.py:121-133``) has no
  equivalent — JAX programs are device-placed by ``jit``/sharding, not by a
  mutable global; :func:`default_device` only reports what XLA picked;
* tensor factories / ``get_numpy`` (``pytorch_utils.py:141-180``) are
  ``jnp.asarray`` / ``np.asarray`` — nothing to wrap;
* ``ValueNorm`` lives in :mod:`dcc_tpu.models.valuenorm` as a pure stats
  pytree; soft/hard target updates (``pytorch_utils.py:51-60``) live in
  :mod:`dcc_tpu.algos.maddpg` as tree-mapped lerps;
* what remains global — seeding, loss shapes, schedules, image tiling — is
  here.
"""

from __future__ import annotations

import random
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def seed_all(seed: int) -> jax.Array:
    """Seed every RNG the framework touches and return the root JAX key.

    Reference: ``utils/util.py:7-12`` seeds random/np/torch globally; JAX
    randomness is functional, so the key returned here is the *only* device
    RNG state — thread it, don't stash it.
    """
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def huber_loss(e: jax.Array, delta: float) -> jax.Array:
    """Elementwise Huber loss (``utils/util.py:36-39``)."""
    a = jnp.abs(e)
    return jnp.where(a <= delta, 0.5 * e * e, delta * (a - 0.5 * delta))


def mse_loss(e: jax.Array) -> jax.Array:
    """Elementwise 0.5*e^2 (``utils/util.py:41-43``)."""
    return 0.5 * e * e


def linear_schedule(initial: float, total_iters: int):
    """Linear LR decay to 0 over ``total_iters`` updates
    (``utils/util.py:29-33``); returns an optax-style count->lr callable."""

    def sched(count):
        frac = jnp.minimum(count, total_iters) / total_iters
        return initial * (1.0 - frac)

    return sched


def global_grad_norm(tree) -> jax.Array:
    """L2 norm over a gradient pytree (``utils/util.py:20-26``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


def tile_images(imgs: Sequence[np.ndarray]) -> np.ndarray:
    """Tile N HxWxC frames into one near-square image
    (``utils/util.py:70-88``; used by the vec-env human render grid)."""
    imgs = np.asarray(imgs)
    n, h, w, c = imgs.shape
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    pad = rows * cols - n
    if pad:
        imgs = np.concatenate([imgs, np.zeros((pad, h, w, c), imgs.dtype)], 0)
    grid = imgs.reshape(rows, cols, h, w, c).transpose(0, 2, 1, 3, 4)
    return grid.reshape(rows * h, cols * w, c)


def default_device() -> jax.Device:
    """The device jit-compiled programs land on by default."""
    return jax.devices()[0]


__all__ = [
    "seed_all",
    "huber_loss",
    "mse_loss",
    "linear_schedule",
    "global_grad_norm",
    "tile_images",
    "default_device",
]
