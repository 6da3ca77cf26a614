"""Fused MLP trunk (LayerNorm -> [Dense -> act -> LayerNorm] x L) in Pallas.

Parity target: the reference's ``algos/algo_utils/mlp.py:7-58`` trunk (the
same computation as :class:`dcc_tpu.models.mlp.MLPBase`), hand-fused for the
PPO-update hot path. Device traces (benchmarks/PERF_NOTES.md) show the XLA
schedule for this trunk is VPU/bandwidth-bound, not MXU-bound: the 110/440
-> 256 layers are thin, and the inter-layer LayerNorms force full-width
``(rows, 256)`` activation round-trips to HBM in both the forward and the
backward pass of every PPO epoch.

This kernel keeps the whole chain resident in VMEM:

* **forward** — one grid program per row tile reads the input tile once,
  runs feature-norm -> (Dense -> act -> LN) x L entirely on-chip, and writes
  only the final features. Weights/scales use constant index maps, so they
  are staged into VMEM once and reused across the whole grid.
* **backward** (custom VJP) — recomputes the forward per tile
  (rematerialization *inside* the kernel: the residual is just the input
  tile), then chains the LayerNorm/activation/Dense gradients in VMEM.
  Weight/bias/scale gradients are accumulated in float32 across row tiles
  in constant-index-map output blocks (TPU grids iterate sequentially, so
  the accumulation is race-free).

Numerics: LayerNorm statistics are computed in float32 with flax's
fast-variance formula (``var = max(0, E[x^2] - E[x]^2)``, eps 1e-6). In
bfloat16 mode the normalize/matmul math runs in bf16 exactly like the flax
mixed-precision path (stats f32, normalize bf16, matmuls bf16 -> f32
accumulate); the backward chain runs in float32 throughout, which is one
rounding step *more* accurate than autodiff of the bf16 graph. Row counts
are zero-padded up to the tile size — zero rows propagate zero cotangents
into every accumulated gradient, so no masking is needed.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # flax.linen.LayerNorm default
# Mosaic's scoped-VMEM default is 16MB; the backward pass's stack (input
# tile + recompute cache + grad accumulators) can exceed it at wide
# inputs / large tiles, which surfaces as a compile-time vmem OOM.
_VMEM_LIMIT = 100 * 1024 * 1024


def _ln_stats(x):
    """float32 mean / rsqrt(var + eps) per row (flax fast-variance)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _EPS)
    return mu, inv


def _ln_fwd(x, scale, bias, bf16):
    """LayerNorm matching flax semantics for the given compute mode.

    Returns (y, xhat_f32, inv_f32); xhat/inv feed the backward chain.
    flax's ``_normalize`` promotes the whole normalize (subtract/scale/bias)
    to float32 (mean/var promotion) and casts only the final result to the
    module dtype — so the bf16 branch here differs from f32 only by the one
    output rounding, exactly like the flax mixed-precision path.
    """
    mu, inv = _ln_stats(x)
    xhat = (x.astype(jnp.float32) - mu) * inv
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if bf16:
        y = y.astype(jnp.bfloat16)
    return y, xhat, inv


def _ln_bwd(g, xhat, inv, scale):
    """d(input), d(scale), d(bias) of y = xhat * scale + bias (f32)."""
    dscale = jnp.sum(g * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(g, axis=0, keepdims=True)
    gg = g * scale
    dx = inv * (
        gg
        - jnp.mean(gg, axis=-1, keepdims=True)
        - xhat * jnp.mean(gg * xhat, axis=-1, keepdims=True)
    )
    return dx, dscale, dbias


def _dense_fwd(a, w, b, bf16):
    """Dense matching flax mixed precision: bf16 operands, f32 MXU accumulate,
    bf16 result (+bias) in bf16 mode; pure f32 otherwise."""
    if bf16:
        z = jnp.dot(
            a.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) + b.astype(jnp.bfloat16)
    else:
        # f32 mode: force the multi-pass MXU decomposition — the default
        # (single-pass bf16) would silently degrade the "faithful" config.
        z = (
            jnp.dot(
                a,
                w,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + b
        )
    return z


def _forward_chain(x, params, n_layers, use_fn, use_relu, bf16):
    """Run the trunk on one tile; returns (out, residual-cache)."""
    # Mosaic on this target lacks bf16 vector compares (arith.cmpf), so run
    # the activation in f32 and cast back — exact for relu (max commutes
    # with the cast), one extra rounding for tanh.
    if use_relu:
        act = lambda z: jnp.maximum(z.astype(jnp.float32), 0).astype(z.dtype)
    else:
        act = lambda z: jnp.tanh(z.astype(jnp.float32)).astype(z.dtype)
    i = 0
    cache = {}
    a = x
    if use_fn:
        fs, fb = params[i], params[i + 1]
        i += 2
        a, xhat, inv = _ln_fwd(a, fs, fb, bf16)
        cache["fn"] = (xhat, inv)
    layers = []
    for li in range(n_layers):
        w, b, g, be = params[i], params[i + 1], params[i + 2], params[i + 3]
        i += 4
        z = _dense_fwd(a, w, b, bf16)
        r = act(z)
        y, xhat, inv = _ln_fwd(r, g, be, bf16)
        layers.append((a, z, r, xhat, inv))
        a = y
    cache["layers"] = layers
    return a, cache


def _fwd_kernel(*refs, n_layers, use_fn, use_relu, bf16):
    n_in = 1 + (2 if use_fn else 0) + 4 * n_layers
    x_ref, param_refs, o_ref = refs[0], refs[1:n_in], refs[n_in]
    params = [p[:] for p in param_refs]
    out, _ = _forward_chain(x_ref[:], params, n_layers, use_fn, use_relu, bf16)
    o_ref[:] = out.astype(o_ref.dtype)


def _bwd_kernel(*refs, n_layers, use_fn, use_relu, bf16):
    n_in = 2 + (2 if use_fn else 0) + 4 * n_layers
    x_ref, g_ref = refs[0], refs[1]
    param_refs = refs[2:n_in]
    out_refs = refs[n_in:]
    dx_ref, grad_refs = out_refs[0], out_refs[1:]
    params = [p[:] for p in param_refs]

    # Rematerialize the forward for this tile entirely in VMEM.
    _, cache = _forward_chain(
        x_ref[:], params, n_layers, use_fn, use_relu, bf16
    )

    first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

        ref[:] += val.astype(ref.dtype)

    # Backward chain. Elementwise/LN math stays float32; the matmuls run
    # mode-faithful — bf16 operands with f32 MXU accumulation in bf16 mode
    # (single-pass, same cost as the stock bf16 autodiff), multi-pass f32
    # in float32 mode (the faithful configuration).
    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    mm_prec = (
        jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    )
    g = g_ref[:].astype(jnp.float32)
    pi = len(params)  # walk the param list backwards
    gi = len(grad_refs)
    for li in reversed(range(n_layers)):
        a, z, r, xhat, inv = cache["layers"][li]
        w, b, gscale = params[pi - 4], params[pi - 3], params[pi - 2]
        g, dscale, dbias = _ln_bwd(g, xhat, inv, gscale.astype(jnp.float32))
        if use_relu:
            g = g * (z.astype(jnp.float32) > 0).astype(jnp.float32)
        else:
            rf = r.astype(jnp.float32)
            g = g * (1.0 - rf * rf)
        dw = jax.lax.dot_general(
            a.astype(mm_dtype),
            g.astype(mm_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )
        db = jnp.sum(g, axis=0, keepdims=True)
        accum(grad_refs[gi - 1], dbias)
        accum(grad_refs[gi - 2], dscale)
        accum(grad_refs[gi - 3], db)
        accum(grad_refs[gi - 4], dw)
        gi -= 4
        pi -= 4
        g = jnp.dot(
            g.astype(mm_dtype),
            w.astype(mm_dtype).T,
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )
    if use_fn:
        xhat, inv = cache["fn"]
        fs = params[0].astype(jnp.float32)
        g, dscale, dbias = _ln_bwd(g, xhat, inv, fs)
        accum(grad_refs[1], dbias)
        accum(grad_refs[0], dscale)
    dx_ref[:] = g.astype(dx_ref.dtype)


def _pad_rows(x, block):
    r = x.shape[0]
    pad = (-r) % block
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


def clamp_block_rows(block_rows: int, d_in: int, n_bufs: int = 3) -> int:
    """Largest row tile (multiple of 256, >= 256) whose width-sized VMEM
    buffers fit the scoped-vmem budget.

    The kernels stage O(n_bufs) ``(block, d_in)`` float32 buffers per tile
    (the input tile, the feature-norm xhat, and the backward's dx /
    rematerialized copy); at wide inputs a fixed tile blows the Mosaic
    scoped-vmem cap — e.g. the 20-UAV preset's 4840-wide centralized obs
    at block 4096 needs ~120 MB against the 100 MB limit (observed
    compile OOM). Budget half the cap for the width-sized buffers, leave
    the rest for params, hidden-width tiles, and pipeline
    double-buffering; narrow inputs (the 4x20 default's 110/440) are
    never clamped at the shipped tile sizes."""
    budget = _VMEM_LIMIT // 2
    cap = budget // (n_bufs * d_in * 4)
    cap = max(256, (cap // 256) * 256)
    return min(block_rows, cap)


@lru_cache(maxsize=None)
def _make_op(n_layers, use_fn, use_relu, bf16, block_rows, interpret):
    n_params = (2 if use_fn else 0) + 4 * n_layers
    out_dtype = jnp.bfloat16 if bf16 else jnp.float32
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kw = dict(n_layers=n_layers, use_fn=use_fn, use_relu=use_relu, bf16=bf16)

    def fwd_call(x, *params):
        rows = x.shape[0]
        xp = _pad_rows(x, block_rows)
        grid = (xp.shape[0] // block_rows,)
        row_spec = lambda d: pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        hidden = params[-4].shape[1]  # last kernel: (d_in, hidden)
        out = pl.pallas_call(
            partial(_fwd_kernel, **kw),
            grid=grid,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            in_specs=[row_spec(x.shape[1])] + [const_spec()] * n_params,
            out_specs=row_spec(hidden),
            out_shape=jax.ShapeDtypeStruct((xp.shape[0], hidden), out_dtype),
            interpret=interpret,
        )(xp, *params)
        return out[:rows]

    @jax.custom_vjp
    def op(x, *params):
        return fwd_call(x, *params)

    def op_fwd(x, *params):
        return fwd_call(x, *params), (x, params)

    def op_bwd(res, g):
        x, params = res
        rows = x.shape[0]
        xp = _pad_rows(x, block_rows)
        gp = _pad_rows(g.astype(jnp.float32), block_rows)
        grid = (xp.shape[0] // block_rows,)
        row_spec = lambda d: pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        grad_shapes = tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params
        )
        acc_specs = tuple(
            pl.BlockSpec(p.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for p in params
        )
        outs = pl.pallas_call(
            partial(_bwd_kernel, **kw),
            grid=grid,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            in_specs=[row_spec(x.shape[1]), row_spec(gp.shape[1])]
            + [const_spec()] * n_params,
            out_specs=(row_spec(x.shape[1]),) + acc_specs,
            out_shape=(
                jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), x.dtype),
            )
            + grad_shapes,
            interpret=interpret,
        )(xp, gp, *params)
        dx, dparams = outs[0][:rows], outs[1:]
        return (dx,) + tuple(dparams)

    op.defvjp(op_fwd, op_bwd)
    return op


def fused_mlp(
    x: jax.Array,
    params: Sequence[jax.Array],
    *,
    n_layers: int,
    use_feature_norm: bool = True,
    use_relu: bool = True,
    bf16: bool = False,
    block_rows: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Apply the fused trunk to ``x`` of shape ``(..., d_in)``.

    ``params`` is the flat float32 parameter list
    ``[fn_scale, fn_bias]? + [kernel_i, bias_i, ln_scale_i, ln_bias_i] * L``
    with 1-D vectors (biases/scales) passed as-is (reshaped to ``(1, d)``
    internally). Differentiable in every parameter and in ``x``.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    p2 = tuple(
        p.reshape(1, -1) if p.ndim == 1 else p for p in params
    )
    block_rows = clamp_block_rows(block_rows, x2.shape[-1])
    op = _make_op(
        n_layers, use_feature_norm, use_relu, bool(bf16), block_rows, interpret
    )
    out = op(x2, *p2)
    return out.reshape(*lead, out.shape[-1])
