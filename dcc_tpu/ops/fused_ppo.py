"""Fused PPO loss + gradient kernels (Pallas, TPU).

Round-2 device traces (benchmarks/PERF_NOTES.md) showed the PPO update is
98% of the training iteration at ~14% MXU — VPU/bandwidth-bound on the
``(rows, 256)`` activation traffic between the trunk, the heads, and the
elementwise surrogate/Huber chains, re-streamed 15 epochs per iteration.
The fused trunk (ops/fused_mlp) removed the *intra-trunk* HBM round-trips
but still hands the full feature matrix to XLA for the heads and loss.

These kernels go all the way: ONE ``pallas_call`` per network computes the
loss **and the parameter gradients** for a whole minibatch —

* **actor** — per row tile: trunk forward (LN -> [Dense -> act -> LN] x L,
  VMEM-resident), gaussian head ``mean = feat @ W + b`` with the
  state-independent ``log_std`` (``distributions.py:72-92``), log-prob of
  the taken action, ratio/clipped-surrogate loss
  (``mappo.py:150-162``), then the full backward chain in the same tile:
  d(mean) -> head grads -> d(features) -> trunk grads. Parameter gradients
  accumulate in float32 VMEM across the sequential grid; the only HBM
  traffic is the input rows and O(params) outputs. Nothing with a
  ``hidden``-sized row dimension ever leaves the chip.
* **critic** — same structure with the value head and the reference's
  clipped + (quirky one-sided) Huber value loss (``mappo.py:103-131``,
  ``utils/util.py:36-38``: ``b = (e > delta)`` only — the negative branch
  really is flat zero, replicated exactly).

Layout note: the narrow per-row operands (actions, old log-probs,
advantages, value targets — a few f32 per row) are packed into ONE
TRANSPOSED ``(k, rows)`` auxiliary array. Row-major ``(rows, k)`` arrays
at a TPU custom-call boundary get their k-wide minor dim tile-padded to
128 lanes (a 64x HBM blowup that OOMs at 10M rows); transposed, the lane
dim is ``rows`` and padding is negligible. All head/loss math inside the
kernel runs in that ``(k, block)`` orientation via transposed
``dot_general`` contractions — no in-kernel transposes of anything large.

Both kernels return SUM-reduced losses/grads; the caller divides by the
row count (mean-loss gradients) and applies loss coefficients.
Gradient-tie conventions replicate JAX autodiff exactly: ``min``/``max``
split the cotangent 50/50 on ties (lax._balanced_eq), ``clip`` composes
the two. Numerics are mode-faithful to the flax paths: bf16 operands with
f32 MXU accumulation in bf16 mode, HIGHEST-precision f32 matmuls
otherwise; all loss/backward elementwise math runs in float32.

Gradient-parity is asserted against ``jax.grad`` of the stock flax loss in
``tests/test_fused_ppo.py`` (interpreter mode).
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _forward_chain, _ln_bwd, _pad_rows

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
_VMEM_LIMIT = 100 * 1024 * 1024  # Mosaic scoped-vmem cap (default 16MB)


def _dot(a, b, dims, bf16):
    """Mode-faithful dot_general: bf16 operands + f32 accumulate in bf16
    mode, HIGHEST-precision f32 otherwise. Returns f32."""
    dt = jnp.bfloat16 if bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if bf16 else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        a.astype(dt),
        b.astype(dt),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _mm(a, b, bf16, transpose_a=False):
    dims = ((0,), (0,)) if transpose_a else ((1,), (0,))
    return _dot(a, b, dims, bf16)


def _balanced_lt(x, y):
    """Cotangent weight for min(x, y) w.r.t. x, matching lax autodiff:
    1 where x<y, 0 where x>y, 0.5 on ties."""
    return jnp.where(x < y, 1.0, jnp.where(x > y, 0.0, 0.5))


def _clip_grad(x, lo, hi):
    """d clip(x, lo, hi) / dx under JAX's min/max balanced-tie convention:
    clip = min(max(x, lo), hi)."""
    gmax = jnp.where(x > lo, 1.0, jnp.where(x < lo, 0.0, 0.5))
    m = jnp.maximum(x, lo)
    gmin = jnp.where(m < hi, 1.0, jnp.where(m > hi, 0.0, 0.5))
    return gmax * gmin


def _ln_bwd_ns(g, xhat, inv):
    """LN input-cotangent with the affine FOLDED OUT (scale==1, and
    dscale/dbias recovered outside the kernel from the folded weight grads
    — see fold_trunk/unfold_trunk_grads)."""
    return inv * (
        g
        - jnp.mean(g, axis=-1, keepdims=True)
        - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True)
    )


def _fwd_chain_folded(x, params, n_layers, use_fn, use_relu, bf16):
    """Trunk forward with every LN affine folded into the NEXT matmul
    (params = [V_i, u_i] * L from :func:`fold_trunk`; the kernel sees no
    LN scales/biases at all). Per-element VPU savings vs _forward_chain:
    the affine multiply-add per LN output, and — via the matching folded
    backward — the per-LN dscale/dbias row reductions and the g*scale
    cotangent multiply. Algebraically identical to the unfolded chain."""
    if use_relu:
        act = lambda z: jnp.maximum(z.astype(jnp.float32), 0).astype(z.dtype)
    else:
        act = lambda z: jnp.tanh(z.astype(jnp.float32)).astype(z.dtype)
    from .fused_mlp import _ln_stats

    cache = {"layers": []}
    a = x
    if use_fn:
        mu, inv = _ln_stats(a)
        xhat = (a.astype(jnp.float32) - mu) * inv
        a = xhat.astype(jnp.bfloat16) if bf16 else xhat
    for li in range(n_layers):
        v, u = params[2 * li], params[2 * li + 1]
        from .fused_mlp import _dense_fwd

        z = _dense_fwd(a, v, u, bf16)
        r = act(z)
        mu, inv = _ln_stats(r)
        xhat = (r.astype(jnp.float32) - mu) * inv
        y = xhat.astype(jnp.bfloat16) if bf16 else xhat
        cache["layers"].append((a, z, r, xhat, inv))
        a = y
    return a, cache


def _trunk_bwd_folded(
    g, cache, params, grad_refs, accum, n_layers, use_fn, use_relu, bf16
):
    """Backward through the folded chain from the cotangent of the final
    xhat. Accumulates only [dV_i, du_i] * L — two reductions fewer per LN
    than _trunk_bwd, and no g*scale multiply (both recovered outside from
    (dV, du) — see unfold_trunk_grads)."""
    pi = len(params)
    gi = len(grad_refs)
    for li in reversed(range(n_layers)):
        a, z, r, xhat, inv = cache["layers"][li]
        v = params[pi - 2]
        g = _ln_bwd_ns(g, xhat, inv)
        if use_relu:
            g = g * (z.astype(jnp.float32) > 0).astype(jnp.float32)
        else:
            rf = r.astype(jnp.float32)
            g = g * (1.0 - rf * rf)
        dv = _mm(a, g, bf16, transpose_a=True)
        du = jnp.sum(g, axis=0, keepdims=True)
        accum(grad_refs[gi - 1], du)
        accum(grad_refs[gi - 2], dv)
        gi -= 2
        pi -= 2
        if li > 0:
            g = _dot(g, v, ((1,), (1,)), bf16)
    # use_fn: the feature-norm has no kernel-side parameters (its affine
    # lives in V_1/u_1); observations need no input gradient.


def fold_trunk(params, head_w, head_b, n_layers, use_fn):
    """Fold LN affines into the consuming matmuls (XLA-side, O(H^2)/epoch).

    ``params``: the flat [fn_scale, fn_bias]? + [W, b, s, c] * L list (2-D
    already, biases as (1, d)); returns (kernel_params = [V, u] * L,
    head_w', head_b') where each consumer's weight absorbs its INPUT
    affine: V = s_in.T * W (row scaling), u = c_in @ W + b."""
    i = 2 if use_fn else 0
    s_in = params[0] if use_fn else None  # (1, d_in)
    c_in = params[1] if use_fn else None
    out = []
    for li in range(n_layers):
        w, b = params[i], params[i + 1]
        if s_in is not None:
            v = s_in.reshape(-1, 1) * w
            u = c_in @ w + b
        else:
            v, u = w, b
        out += [v, u]
        s_in, c_in = params[i + 2], params[i + 3]
        i += 4
    head_wf = s_in.reshape(-1, 1) * head_w
    head_bf = (c_in @ head_w).reshape(head_b.shape) + head_b
    return tuple(out), head_wf, head_bf


def unfold_trunk_grads(
    kgrads, dhead_w, dhead_b, params, head_w, n_layers, use_fn
):
    """Map folded-kernel grads [dV, du] * L + (dW'_h, db'_h) back onto the
    ORIGINAL parameters (W, b, s, c per layer, fn affine, head):

        dW = s_in^T * dV + c_in^T (x) du      db = du
        ds_in = sum_d dV * W                  dc_in = du @ W^T

    (each LN affine has exactly one consumer, so assignments, not +=)."""
    i = 2 if use_fn else 0
    s_in = params[0] if use_fn else None
    c_in = params[1] if use_fn else None
    out = [None] * len(params)
    for li in range(n_layers):
        w = params[i]
        dv, du = kgrads[2 * li], kgrads[2 * li + 1]
        if s_in is not None:
            dw = s_in.reshape(-1, 1) * dv + c_in.reshape(-1, 1) * du
            # grads of the INPUT affine (fn for li=0, ln_{li-1} otherwise)
            out[i - 2] = jnp.sum(dv * w, axis=1, keepdims=True).reshape(
                s_in.shape
            )
            out[i - 1] = (du @ w.T).reshape(c_in.shape)
        else:
            dw = dv
        out[i] = dw
        out[i + 1] = du
        s_in, c_in = params[i + 2], params[i + 3]
        i += 4
    w = head_w
    dwh = s_in.reshape(-1, 1) * dhead_w + c_in.reshape(-1, 1) * dhead_b.reshape(1, -1)
    out[i - 2] = jnp.sum(dhead_w * w, axis=1, keepdims=True).reshape(s_in.shape)
    out[i - 1] = (dhead_b.reshape(1, -1) @ w.T).reshape(c_in.shape)
    dbh = dhead_b
    return tuple(out), dwh, dbh


def _trunk_bwd(g, cache, params, grad_refs, accum, n_layers, use_fn, use_relu, bf16):
    """Backward through the trunk chain from feature cotangent ``g`` (f32,
    (block, hidden)), accumulating parameter grads via ``accum(ref, val)``.
    Mirrors fused_mlp._bwd_kernel's chain (mode-faithful matmuls); skips the
    d(input) computation — observations need no gradient."""
    pi = len(params)
    gi = len(grad_refs)
    for li in reversed(range(n_layers)):
        a, z, r, xhat, inv = cache["layers"][li]
        w, gscale = params[pi - 4], params[pi - 2]
        g, dscale, dbias = _ln_bwd(g, xhat, inv, gscale.astype(jnp.float32))
        if use_relu:
            g = g * (z.astype(jnp.float32) > 0).astype(jnp.float32)
        else:
            rf = r.astype(jnp.float32)
            g = g * (1.0 - rf * rf)
        dw = _mm(a, g, bf16, transpose_a=True)
        db = jnp.sum(g, axis=0, keepdims=True)
        accum(grad_refs[gi - 1], dbias)
        accum(grad_refs[gi - 2], dscale)
        accum(grad_refs[gi - 3], db)
        accum(grad_refs[gi - 4], dw)
        gi -= 4
        pi -= 4
        if li > 0 or use_fn:
            # g @ w^T: contract the d_out dims
            g = _dot(g, w, ((1,), (1,)), bf16)
    if use_fn:
        xhat, inv = cache["fn"]
        fs = params[0].astype(jnp.float32)
        _, dscale, dbias = _ln_bwd(g, xhat, inv, fs)
        accum(grad_refs[1], dbias)
        accum(grad_refs[0], dscale)


def _make_accum():
    first = pl.program_id(0) == 0

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

        ref[:] += val.astype(ref.dtype)

    return accum


# ---------------------------------------------------------------------------
# actor: clipped-surrogate policy loss + grads
# ---------------------------------------------------------------------------
# aux_T rows: [action_0..action_{A-1}, old_log_prob, advantage, valid]

def _actor_kernel(
    *refs, n_layers, use_fn, use_relu, bf16, clip_param, act_dim, folded=False
):
    n_trunk = 2 * n_layers if folded else (2 if use_fn else 0) + 4 * n_layers
    n_in = 2 + n_trunk + 3  # x, aux_T, trunk..., Wh, bh_T, log_std_T
    x_ref, aux_ref = refs[:2]
    trunk_refs = refs[2 : 2 + n_trunk]
    wh_ref, bh_ref, ls_ref = refs[2 + n_trunk : n_in]
    out_refs = refs[n_in:]
    # outputs: trunk grads..., dWh, dbh_T (act,1), dlog_std_T (act,1), met (1,2)
    grad_refs = out_refs[:n_trunk]
    dwh_ref, dbh_ref, dls_ref, met_ref = out_refs[n_trunk:]
    accum = _make_accum()

    params = [p[:] for p in trunk_refs]
    chain = _fwd_chain_folded if folded else _forward_chain
    feat, cache = chain(x_ref[:], params, n_layers, use_fn, use_relu, bf16)

    wh = wh_ref[:]  # (H, act)
    # mean_T[d, r] = sum_h Wh[h, d] * feat[r, h]  -> (act, block)
    mean_T = _dot(wh, feat, ((0,), (1,)), bf16)
    bh_T = bh_ref[:]  # (act, 1)
    if bf16:
        mean_T = (
            mean_T.astype(jnp.bfloat16) + bh_T.astype(jnp.bfloat16)
        ).astype(jnp.float32)
    else:
        mean_T = mean_T + bh_T.astype(jnp.float32)

    aux = aux_ref[:].astype(jnp.float32)  # (act+3, block)
    a_T = aux[0:act_dim, :]
    old_lp = aux[act_dim : act_dim + 1, :]
    adv = aux[act_dim + 1 : act_dim + 2, :]
    valid = aux[act_dim + 2 : act_dim + 3, :]

    log_std_T = ls_ref[:].astype(jnp.float32)  # (act, 1)
    inv_std = jnp.exp(-log_std_T)
    z = (a_T - mean_T) * inv_std  # (act, block)
    lp = jnp.sum(
        -0.5 * z * z - log_std_T - _LOG_SQRT_2PI, axis=0, keepdims=True
    )  # (1, block)
    ratio = jnp.exp(lp - old_lp)
    clipped = jnp.clip(ratio, 1.0 - clip_param, 1.0 + clip_param)
    s1 = ratio * adv
    s2 = clipped * adv
    loss_rows = -jnp.minimum(s1, s2)  # (1, block)

    # padded columns carry adv=0 -> zero loss and zero backward terms (every
    # gradient below is proportional to adv); the ratio METRIC is not
    # adv-weighted, so it is masked by the validity row explicitly
    accum(
        met_ref,
        jnp.concatenate(
            [
                jnp.sum(loss_rows).reshape(1, 1),
                jnp.sum(ratio * valid).reshape(1, 1),
            ],
            axis=1,
        ),
    )

    # ---- backward (all f32) ----
    w1 = _balanced_lt(s1, s2)
    dratio = -(
        w1 * adv
        + (1.0 - w1) * adv * _clip_grad(ratio, 1.0 - clip_param, 1.0 + clip_param)
    )
    dlp = dratio * ratio  # (1, block)
    dmean_T = dlp * z * inv_std  # (act, block)
    accum(dls_ref, jnp.sum(dlp * (z * z - 1.0), axis=1, keepdims=True))
    accum(dbh_ref, jnp.sum(dmean_T, axis=1, keepdims=True))
    # dWh[h, d] = sum_r feat[r, h] * dmean_T[d, r]
    accum(dwh_ref, _dot(feat, dmean_T, ((0,), (1,)), bf16))
    # g_feat[r, h] = sum_d dmean_T[d, r] * Wh[h, d]
    g_feat = _dot(dmean_T, wh.astype(jnp.float32), ((0,), (1,)), bf16)
    tb = _trunk_bwd_folded if folded else _trunk_bwd
    tb(g_feat, cache, params, grad_refs, accum, n_layers, use_fn, use_relu, bf16)


# ---------------------------------------------------------------------------
# critic: clipped + (one-sided) Huber value loss + grads
# ---------------------------------------------------------------------------
# aux_T rows: [vpred, ret_raw, valid]; norm (1, 2) = [shift, scale] applies
# the caller's value normalizer in-kernel: ret_target = (ret_raw - shift) /
# scale — bit-identical to ValueNorm/PopArt normalize ((x - mean)/sqrt(var))
# with shift=mean, scale=sqrt(var). Keeps the big aux array loop-invariant
# across the epoch scan (only the two scalars change per epoch).

def _critic_kernel(
    *refs,
    n_layers,
    use_fn,
    use_relu,
    bf16,
    clip_param,
    huber_delta,
    use_huber,
    use_clipped,
    folded=False,
):
    n_trunk = 2 * n_layers if folded else (2 if use_fn else 0) + 4 * n_layers
    n_in = 3 + n_trunk + 2  # cent, aux_T, norm, trunk..., wv, bv_T
    x_ref, aux_ref, norm_ref = refs[:3]
    trunk_refs = refs[3 : 3 + n_trunk]
    wv_ref, bv_ref = refs[3 + n_trunk : n_in]
    out_refs = refs[n_in:]
    grad_refs = out_refs[:n_trunk]
    dwv_ref, dbv_ref, met_ref = out_refs[n_trunk:]
    accum = _make_accum()

    params = [p[:] for p in trunk_refs]
    chain = _fwd_chain_folded if folded else _forward_chain
    feat, cache = chain(x_ref[:], params, n_layers, use_fn, use_relu, bf16)
    wv = wv_ref[:]  # (H, 1)
    v = _dot(wv, feat, ((0,), (1,)), bf16)  # (1, block)
    bv_T = bv_ref[:]  # (1, 1)
    if bf16:
        v = (v.astype(jnp.bfloat16) + bv_T.astype(jnp.bfloat16)).astype(jnp.float32)
    else:
        v = v + bv_T.astype(jnp.float32)

    aux = aux_ref[:].astype(jnp.float32)  # (3, block)
    vpred = aux[0:1, :]
    norm = norm_ref[:].astype(jnp.float32)  # (1, 2): [shift, scale]
    ret = (aux[1:2, :] - norm[0:1, 0:1]) / norm[0:1, 1:2]
    valid = aux[2:3, :]

    if use_huber:
        # utils/util.py:36-38: a*e^2/2 + b*delta*(|e| - delta/2),
        # a = (|e| <= delta), b = (e > delta) -- one-sided, replicated
        def lf(e):
            aa = (jnp.abs(e) <= huber_delta).astype(jnp.float32)
            bb = (e > huber_delta).astype(jnp.float32)
            return aa * e * e / 2.0 + bb * huber_delta * (
                jnp.abs(e) - huber_delta / 2.0
            )

        def dlf(e):
            aa = (jnp.abs(e) <= huber_delta).astype(jnp.float32)
            bb = (e > huber_delta).astype(jnp.float32)
            return aa * e + bb * huber_delta
    else:
        lf = lambda e: e * e / 2.0
        dlf = lambda e: e

    err = ret - v
    if use_clipped:
        dv_raw = v - vpred
        v_clip = vpred + jnp.clip(dv_raw, -clip_param, clip_param)
        err_c = ret - v_clip
        h1, h2 = lf(err), lf(err_c)
        loss_rows = jnp.maximum(h1, h2) * valid
        accum(met_ref, jnp.sum(loss_rows).reshape(1, 1))
        # backward: max ties split 50/50 (lax._balanced_eq)
        w1 = _balanced_lt(h2, h1)  # weight of the h1 branch
        dloss_dv = -(
            w1 * dlf(err)
            + (1.0 - w1) * dlf(err_c) * _clip_grad(dv_raw, -clip_param, clip_param)
        )
    else:
        loss_rows = lf(err) * valid
        accum(met_ref, jnp.sum(loss_rows).reshape(1, 1))
        dloss_dv = -dlf(err)
    dv = dloss_dv * valid  # (1, block)

    accum(dbv_ref, jnp.sum(dv, axis=1, keepdims=True))
    # dwv[h, 0] = sum_r feat[r, h] * dv[0, r]
    accum(dwv_ref, _dot(feat, dv, ((0,), (1,)), bf16))
    # g_feat[r, h] = dv[0, r] * wv[h, 0]
    g_feat = _dot(dv, wv.astype(jnp.float32), ((0,), (1,)), bf16)
    tb = _trunk_bwd_folded if folded else _trunk_bwd
    tb(g_feat, cache, params, grad_refs, accum, n_layers, use_fn, use_relu, bf16)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pad_cols(x, block):
    c = x.shape[1]
    pad = (-c) % block
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x


def pack_actor_aux(act, old_lp, adv, block_rows):
    """Pack the actor's per-row operands into the transposed (act+3, Rp)
    aux array ONCE — loop-invariant across the epoch scan (the column
    padding produces adv=0/valid=0 rows: zero loss, zero grads)."""
    rows = act.shape[0]
    aux = jnp.concatenate(
        [
            act.T.astype(jnp.float32),
            old_lp.T.astype(jnp.float32),
            adv.T.astype(jnp.float32),
            jnp.ones((1, rows), jnp.float32),
        ],
        axis=0,
    )
    return _pad_cols(aux, block_rows)


def pack_critic_aux(vpred, ret_raw, block_rows):
    """Pack the critic's per-row operands ([vpred, RAW returns, valid]) —
    loop-invariant: the value normalizer is applied in-kernel from the
    per-epoch (shift, scale) scalars."""
    rows = vpred.shape[0]
    aux = jnp.concatenate(
        [
            vpred.T.astype(jnp.float32),
            ret_raw.T.astype(jnp.float32),
            jnp.ones((1, rows), jnp.float32),
        ],
        axis=0,
    )
    return _pad_cols(aux, block_rows)


@lru_cache(maxsize=None)
def _make_actor_op(
    n_layers, use_fn, use_relu, bf16, clip_param, act_dim, block_rows,
    interpret, folded=False,
):
    kw = dict(
        n_layers=n_layers,
        use_fn=use_fn,
        use_relu=use_relu,
        bf16=bf16,
        clip_param=clip_param,
        act_dim=act_dim,
        folded=folded,
    )
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def op(xp, auxp, trunk_params, wh, bh, log_std):
        grid = (xp.shape[0] // block_rows,)
        row_spec = lambda d: pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        aux_spec = pl.BlockSpec(
            (act_dim + 3, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        acc_spec = lambda shp: pl.BlockSpec(
            shp, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        p2 = tuple(p.reshape(1, -1) if p.ndim == 1 else p for p in trunk_params)
        bh2 = bh.reshape(-1, 1)  # (act, 1)
        ls2 = log_std.reshape(-1, 1)
        if folded:
            kp, whf, bhf = fold_trunk(p2, wh, bh2, n_layers, use_fn)
        else:
            kp, whf, bhf = p2, wh, bh2
        grad_shapes = tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp
        ) + (
            jax.ShapeDtypeStruct(wh.shape, jnp.float32),
            jax.ShapeDtypeStruct((act_dim, 1), jnp.float32),
            jax.ShapeDtypeStruct((act_dim, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),  # [loss_sum, ratio_sum]
        )
        acc_specs = tuple(acc_spec(s.shape) for s in grad_shapes)
        outs = pl.pallas_call(
            partial(_actor_kernel, **kw),
            grid=grid,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            in_specs=[row_spec(xp.shape[1]), aux_spec]
            + [const_spec()] * (len(kp) + 3),
            out_specs=acc_specs,
            out_shape=grad_shapes,
            interpret=interpret,
        )(xp, auxp, *kp, whf, bhf, ls2)
        kgrads = outs[: len(kp)]
        dwh, dbh, dls, met = outs[len(kp) :]
        if folded:
            trunk_grads, dwh, dbh = unfold_trunk_grads(
                kgrads, dwh, dbh, p2, wh, n_layers, use_fn
            )
        else:
            trunk_grads = kgrads
        return trunk_grads, dwh, dbh[:, 0], dls[:, 0], met[0]

    return op


def actor_ppo_grads_packed(
    xp, auxp, trunk_params, head_kernel, head_bias, log_std, *,
    n_layers, use_feature_norm=True, use_relu=True, bf16=False,
    clip_param=0.2, act_dim=2, block_rows=2048, interpret=False, fold=False,
):
    """Like :func:`actor_ppo_grads` but on pre-padded ``xp`` (rows already
    a block_rows multiple) and a pre-packed aux from :func:`pack_actor_aux`
    — the hot-loop entry (nothing per-call to re-pack). ``fold=True``
    runs the affine-folded kernel (fold_trunk/unfold_trunk_grads): same
    math, every LN affine absorbed into the consuming matmul."""
    op = _make_actor_op(
        n_layers, use_feature_norm, use_relu, bool(bf16), float(clip_param),
        act_dim, block_rows, interpret, folded=bool(fold),
    )
    return op(xp, auxp, tuple(trunk_params), head_kernel, head_bias, log_std)


@lru_cache(maxsize=None)
def _make_critic_op(
    n_layers,
    use_fn,
    use_relu,
    bf16,
    clip_param,
    huber_delta,
    use_huber,
    use_clipped,
    block_rows,
    interpret,
    folded=False,
):
    kw = dict(
        n_layers=n_layers,
        use_fn=use_fn,
        use_relu=use_relu,
        bf16=bf16,
        clip_param=clip_param,
        huber_delta=huber_delta,
        use_huber=use_huber,
        use_clipped=use_clipped,
        folded=folded,
    )
    const_spec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    def op(xp, auxp, norm, trunk_params, wv, bv):
        grid = (xp.shape[0] // block_rows,)
        row_spec = lambda d: pl.BlockSpec(
            (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        aux_spec = pl.BlockSpec(
            (3, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        acc_spec = lambda shp: pl.BlockSpec(
            shp, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        p2 = tuple(p.reshape(1, -1) if p.ndim == 1 else p for p in trunk_params)
        bv2 = bv.reshape(-1, 1)  # (1, 1)
        if folded:
            kp, wvf, bvf = fold_trunk(p2, wv, bv2, n_layers, use_fn)
        else:
            kp, wvf, bvf = p2, wv, bv2
        grad_shapes = tuple(
            jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in kp
        ) + (
            jax.ShapeDtypeStruct(wv.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # [value_loss_sum]
        )
        acc_specs = tuple(acc_spec(s.shape) for s in grad_shapes)
        outs = pl.pallas_call(
            partial(_critic_kernel, **kw),
            grid=grid,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            in_specs=[row_spec(xp.shape[1]), aux_spec, const_spec()]
            + [const_spec()] * (len(kp) + 2),
            out_specs=acc_specs,
            out_shape=grad_shapes,
            interpret=interpret,
        )(xp, auxp, norm, *kp, wvf, bvf)
        kgrads = outs[: len(kp)]
        dwv, dbv, met = outs[len(kp) :]
        if folded:
            trunk_grads, dwv, dbv = unfold_trunk_grads(
                kgrads, dwv, dbv, p2, wv, n_layers, use_fn
            )
        else:
            trunk_grads = kgrads
        return trunk_grads, dwv, dbv[:, 0], met[0]

    return op


def critic_value_grads_packed(
    xp, auxp, norm, trunk_params, head_kernel, head_bias, *,
    n_layers, use_feature_norm=True, use_relu=True, bf16=False,
    clip_param=0.2, huber_delta=10.0, use_huber=True, use_clipped=True,
    block_rows=2048, interpret=False, fold=False,
):
    """Like :func:`critic_value_grads` but on pre-padded ``xp``, a
    pre-packed aux from :func:`pack_critic_aux` (RAW returns), and the
    per-epoch normalizer scalars ``norm = [[shift, scale]]`` applied
    in-kernel. ``fold=True`` as in :func:`actor_ppo_grads_packed`."""
    op = _make_critic_op(
        n_layers, use_feature_norm, use_relu, bool(bf16), float(clip_param),
        float(huber_delta), bool(use_huber), bool(use_clipped), block_rows,
        interpret, folded=bool(fold),
    )
    return op(xp, auxp, norm, tuple(trunk_params), head_kernel, head_bias)


def actor_ppo_grads(
    x: jax.Array,
    act: jax.Array,
    old_log_prob: jax.Array,
    adv: jax.Array,
    trunk_params: Tuple[jax.Array, ...],
    head_kernel: jax.Array,
    head_bias: jax.Array,
    log_std: jax.Array,
    *,
    n_layers: int,
    use_feature_norm: bool = True,
    use_relu: bool = True,
    bf16: bool = False,
    clip_param: float = 0.2,
    block_rows: int = 1024,
    interpret: bool = False,
    fold: bool = False,
):
    """SUM-reduced clipped-surrogate loss + gradients over all rows.

    Returns ``(trunk_grads, d_head_kernel, d_head_bias, d_log_std,
    (policy_loss_sum, ratio_sum))`` — divide by the row count for
    mean-loss gradients. ``x`` rows are ``(rows, d_in)``.
    """
    op = _make_actor_op(
        n_layers,
        use_feature_norm,
        use_relu,
        bool(bf16),
        float(clip_param),
        act.shape[-1],
        block_rows,
        interpret,
        folded=bool(fold),
    )
    xp = _pad_rows(x, block_rows)
    auxp = pack_actor_aux(act, old_log_prob, adv, block_rows)
    return op(xp, auxp, tuple(trunk_params), head_kernel, head_bias, log_std)


def critic_value_grads(
    cent: jax.Array,
    vpred: jax.Array,
    ret_target: jax.Array,
    trunk_params: Tuple[jax.Array, ...],
    head_kernel: jax.Array,
    head_bias: jax.Array,
    *,
    n_layers: int,
    use_feature_norm: bool = True,
    use_relu: bool = True,
    bf16: bool = False,
    clip_param: float = 0.2,
    huber_delta: float = 10.0,
    use_huber: bool = True,
    use_clipped: bool = True,
    block_rows: int = 1024,
    interpret: bool = False,
    fold: bool = False,
):
    """SUM-reduced clipped/Huber value loss + gradients over all rows.

    Returns ``(trunk_grads, d_head_kernel, d_head_bias,
    (value_loss_sum,))``."""
    op = _make_critic_op(
        n_layers,
        use_feature_norm,
        use_relu,
        bool(bf16),
        float(clip_param),
        float(huber_delta),
        bool(use_huber),
        bool(use_clipped),
        block_rows,
        interpret,
        folded=bool(fold),
    )
    xp = _pad_rows(cent, block_rows)
    auxp = pack_critic_aux(vpred, ret_target, block_rows)
    norm = jnp.asarray([[0.0, 1.0]], jnp.float32)  # identity: ret pre-normalized
    return op(xp, auxp, norm, tuple(trunk_params), head_kernel, head_bias)
