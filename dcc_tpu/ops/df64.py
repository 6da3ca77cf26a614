"""Double-float ("df64") arithmetic: ~48-bit-mantissa math from f32 pairs.

TPUs have no hardware double precision, so the reference's float64 numpy
physics (``/root/reference/uav_dcc_control/envs/mpe/multiagent/core.py`` —
everything is default-dtype numpy, i.e. f64) cannot be matched bit-for-bit
on-chip.  This module provides the classic Dekker/Knuth error-free
transformations (two-sum, two-product via Veltkamp splitting) and the
double-float composite ops built from them, so selected high-sensitivity
paths — the connectivity pull force, whose softplus argument multiplies
distance error by 1/contact_margin = 1e3
(``CoverageWorld.py:129-140``) — can run at ~2^-48 relative error on the
TPU VPU while the env state stays float32.

All ops are elementwise over (hi, lo) pairs of f32 arrays with
|lo| <= ulp(hi)/2; they rely only on IEEE-754 round-to-nearest f32
add/sub/mul, which the TPU VPU provides (no fast-math reassociation:
XLA preserves the written association of float ops).

References (public domain algorithms): T.J. Dekker, "A floating-point
technique for extending the available precision" (1971); D.E. Knuth,
TAOCP vol. 2 (two-sum); Hida/Li/Bailey's ddfun conventions.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jax.Array, jax.Array]

# Veltkamp splitting constant for binary32: 2^ceil(24/2) + 1
_SPLIT = 4097.0


def two_sum(a: jax.Array, b: jax.Array) -> Pair:
    """Knuth two-sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a: jax.Array, b: jax.Array) -> Pair:
    """Dekker two-sum, valid when |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_diff(a: jax.Array, b: jax.Array) -> Pair:
    """s + e == a - b exactly, s = fl(a - b)."""
    s = a - b
    bb = s - a
    e = (a - (s - bb)) - (b + bb)
    return s, e


def _split(a: jax.Array) -> Pair:
    c = jnp.asarray(_SPLIT, a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a: jax.Array, b: jax.Array) -> Pair:
    """p + e == a * b exactly (Dekker product, no FMA dependence)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# composite ops on (hi, lo) pairs


def add(x: Pair, y: Pair) -> Pair:
    """Double-float addition (Bailey's sloppy add: ~2 ulp of the pair)."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return fast_two_sum(s, e)


def add_f32(x: Pair, b: jax.Array) -> Pair:
    s, e = two_sum(x[0], b)
    return fast_two_sum(s, e + x[1])


def neg(x: Pair) -> Pair:
    return -x[0], -x[1]


def sub(x: Pair, y: Pair) -> Pair:
    return add(x, neg(y))


def mul(x: Pair, y: Pair) -> Pair:
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return fast_two_sum(p, e)


def mul_f32(x: Pair, b: jax.Array) -> Pair:
    p, e = two_prod(x[0], b)
    return fast_two_sum(p, e + x[1] * b)


def div(x: Pair, y: Pair) -> Pair:
    """Double-float division: one f32 quotient + one refined correction."""
    q0 = x[0] / y[0]
    # r = x - q0 * y, in double-float
    r = sub(x, mul_f32(y, q0))
    q1 = (r[0] + r[1]) / y[0]
    return fast_two_sum(q0, q1)


def div_f32(x: Pair, b: jax.Array) -> Pair:
    q0 = x[0] / b
    p, e = two_prod(q0, b)
    r = (x[0] - p) + x[1] - e
    return fast_two_sum(q0, r / b)


def sqrt(x: Pair) -> Pair:
    """Double-float square root via one Newton/Karp refinement of f32 sqrt.

    Requires x >= 0; sqrt((0, 0)) = (0, 0) is handled by the guard (the
    callers' distances are > 0 away from the masked diagonal).
    """
    s0 = jnp.sqrt(x[0])
    safe = jnp.where(s0 > 0, s0, jnp.ones_like(s0))
    p, e = two_prod(safe, safe)
    # residual x - s0^2 in double-float, then corr = r / (2 s0)
    r = (x[0] - p) + x[1] - e
    corr = jnp.where(s0 > 0, r / (2.0 * safe), jnp.zeros_like(s0))
    return fast_two_sum(s0, corr)


def from_f64(v: float, dtype=jnp.float32) -> Tuple[float, float]:
    """Split a Python double into an exact (hi, lo) f32 constant pair."""
    import numpy as np

    hi = np.asarray(v, np.float32)
    lo = np.asarray(v - float(hi), np.float32)
    return (jnp.asarray(hi, dtype), jnp.asarray(lo, dtype))


def to_f32(x: Pair) -> jax.Array:
    return x[0] + x[1]
