"""On-chip bisection of the fused PPO update kernels (round-5 perf push).

Times the actor/critic fused loss+grad kernels (ops/fused_ppo) and the
trunk-forward-only kernel (ops/fused_mlp) at the headline shape
(16384 envs x T=150, bf16) across row-tile sizes, to locate where the
~91 ms/epoch goes (PERF_NOTES round-4 roofline: MXU bound 21 ms, measured
~91 ms -> VPU-dominated) before attempting kernel surgery.

Usage: python scripts/perf_probe.py [blocks...]   (default 2048 4096 8192)
Env: PROBE_ENVS / PROBE_T / PROBE_REPS override the shape.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dcc_tpu.ops import fused_ppo as FP  # noqa: E402
from dcc_tpu.ops import fused_mlp as FM  # noqa: E402

E = int(os.environ.get("PROBE_ENVS", "16384"))
T = int(os.environ.get("PROBE_T", "150"))
REPS = int(os.environ.get("PROBE_REPS", "3"))
A, DIN, H, ACT = 4, 110, 256, 2
DCENT = A * DIN
R = T * E * A
RV = T * E


def _median_time(fn, *args):
    fn(*args)  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        # tunneled backend: force a real device->host scalar fetch
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def trunk_params(key, din):
    ks = jax.random.split(key, 12)
    p = [
        jnp.ones((din,), jnp.float32),  # fn scale
        jnp.zeros((din,), jnp.float32),  # fn bias
    ]
    dims = [(din, H), (H, H)]
    for i, (a, b) in enumerate(dims):
        p += [
            jax.random.normal(ks[i], (a, b), jnp.float32) * 0.05,
            jnp.zeros((b,), jnp.float32),
            jnp.ones((b,), jnp.float32),
            jnp.zeros((b,), jnp.float32),
        ]
    return tuple(p)


def main():
    blocks = [int(b) for b in sys.argv[1:]] or [2048, 4096, 8192]
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    print(f"shape: R={R} rows x {DIN} (actor), Rv={RV} x {DCENT} (critic), bf16")

    obs = jax.random.normal(key, (R, DIN), dt)
    cent = obs.reshape(RV, DCENT)
    act = jax.random.normal(jax.random.fold_in(key, 1), (R, ACT), jnp.float32)
    logp = jax.random.normal(jax.random.fold_in(key, 2), (R, 1), jnp.float32)
    adv = jax.random.normal(jax.random.fold_in(key, 3), (R, 1), jnp.float32)
    vpred = jax.random.normal(jax.random.fold_in(key, 4), (RV, 1), jnp.float32)
    ret = jax.random.normal(jax.random.fold_in(key, 5), (RV, 1), jnp.float32)
    tp_a = trunk_params(key, DIN)
    tp_c = trunk_params(jax.random.fold_in(key, 9), DCENT)
    wh = jax.random.normal(jax.random.fold_in(key, 6), (H, ACT), jnp.float32) * 0.01
    bh = jnp.zeros((ACT,), jnp.float32)
    ls = jnp.zeros((ACT,), jnp.float32)
    wv = jax.random.normal(jax.random.fold_in(key, 7), (H, 1), jnp.float32) * 0.01
    bv = jnp.zeros((1,), jnp.float32)
    norm = jnp.asarray([[0.0, 1.0]], jnp.float32)

    for br in blocks:
        obs_p = FM._pad_rows(obs, br)
        aux_a = FP.pack_actor_aux(act, logp, adv, br)
        cent_p = FM._pad_rows(cent, br)
        aux_c = FP.pack_critic_aux(vpred, ret, br)

        a_fn = jax.jit(
            lambda o, x: FP.actor_ppo_grads_packed(
                o, x, tp_a, wh, bh, ls, n_layers=2, bf16=True,
                act_dim=ACT, block_rows=br,
            )
        )
        t_a = _median_time(a_fn, obs_p, aux_a)
        c_fn = jax.jit(
            lambda o, x: FP.critic_value_grads_packed(
                o, x, norm, tp_c, wv, bv, n_layers=2, bf16=True, block_rows=br,
            )
        )
        t_c = _median_time(c_fn, cent_p, aux_c)
        print(
            f"block {br:5d}: actor {t_a*1e3:7.1f} ms  critic {t_c*1e3:7.1f} ms  "
            f"epoch {1e3*(t_a+t_c):7.1f} ms",
            flush=True,
        )
        if os.environ.get("PROBE_TRUNK", "1") == "1":
            # trunk-only forward (no head/loss/backward): run on 1/4 of the
            # rows (the (rows, 256) OUTPUT alone is 5 GB at full R) and scale
            quarter = obs_p.shape[0] // 4 // br * br
            f_a = jax.jit(
                lambda o: FM.fused_mlp(
                    o, tp_a, n_layers=2, bf16=True, block_rows=br
                )
            )
            t_fa = 4 * _median_time(f_a, obs_p[:quarter])
            quarter_c = cent_p.shape[0] // 4 // br * br
            f_c = jax.jit(
                lambda o: FM.fused_mlp(
                    o, tp_c, n_layers=2, bf16=True, block_rows=br
                )
            )
            t_fc = 4 * _median_time(f_c, cent_p[:quarter_c])
            print(
                f"             trunk-fwd actor {t_fa*1e3:7.1f} ms  critic "
                f"{t_fc*1e3:7.1f} ms (fwd-trunk share {(t_fa+t_fc)/(t_a+t_c):.2f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
    os._exit(0)
