"""Headline benchmark: full MAPPO training throughput on one TPU chip.

Measures env-steps/s of the complete training iteration (fresh-reset rollout
of vmapped envs x 150 steps + GAE + 15-epoch PPO update, all in one jitted
program) on the default 4-UAV / 20-PoI config, in two configurations:

* **bfloat16 production config (the headline)** — 16384 envs, mixed
  precision (bf16 trunk matmuls on the MXU, f32 master weights /
  distributions / losses), the Pallas fused-MLP trunk
  (dcc_tpu/ops/fused_mlp, auto-selected), gradient accumulation over 4 row
  chunks. The fastest measured single-chip configuration
  (benchmarks/PERF_NOTES.md).
* **float32 parity config** — 4096 envs, full float32, the bit-faithful
  reference-semantics configuration.

Baseline: the reference implementation's full pipeline measured on this
host's CPU (benchmarks/reference_baseline.json; the reference is
Python+torch with a synchronous env farm and publishes no numbers of its
own — see BASELINE.md). The baseline runs float32; the float32_* fields are
the apples-to-apples comparison, the headline is the production number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "dtype",
"n_envs", "update_chunks", "fused_trunk", "float32_value",
"float32_vs_baseline", ...}. Override knobs: BENCH_ENVS / BENCH_T /
BENCH_ITERS / BENCH_DTYPE / BENCH_REMAT / BENCH_CHUNKS / BENCH_FUSED
(restricts the run to one explicitly-shaped configuration).
"""

import json
import os
import sys
import time


def _measure(n_envs, T, iters, dtype, remat, chunks=1, fused="auto",
             block_rows=1024):
    import jax

    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    cfg = MAPPOConfig(
        n_rollout_threads=n_envs,
        episode_length=T,
        use_remat=remat,
        update_chunks=chunks,
        compute_dtype=dtype,
        fused_trunk=fused,
        fused_block_rows=block_rows,
    )
    algo = MAPPO(cfg, EnvConfig())
    ts = algo.init_state(jax.random.PRNGKey(0))
    train = jax.jit(algo.train_iteration)
    key = jax.random.PRNGKey(1)
    # compile + warmup. NB: on the tunneled TPU backend block_until_ready can
    # return before remote execution finishes, so synchronize with an actual
    # device->host scalar fetch.
    for _ in range(2):
        ts, m = train(ts, key)
        float(m.reward)
    times = []
    for _ in range(iters):
        t0 = time.time()
        ts, m = train(ts, key)
        float(m.reward)  # hard sync
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]
    return n_envs * T / dt


def main():
    T = int(os.environ.get("BENCH_T", "150"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    only = os.environ.get("BENCH_DTYPE")  # float32|bfloat16 -> one config

    # The two standing configurations (see module docstring).
    headline_cfg = dict(
        n_envs=16384, dtype="bfloat16", chunks=4, fused="auto", remat=False
    )
    parity_cfg = dict(
        n_envs=4096, dtype="float32", chunks=1, fused="auto", remat=False
    )
    if only:
        base_cfg = headline_cfg if only.startswith("b") else parity_cfg
        cfgs = [
            dict(
                base_cfg,
                dtype=only,
                n_envs=int(os.environ.get("BENCH_ENVS", base_cfg["n_envs"])),
                chunks=int(
                    os.environ.get("BENCH_CHUNKS", base_cfg["chunks"])
                ),
                fused=os.environ.get("BENCH_FUSED", base_cfg["fused"]),
                remat=remat,
            )
        ]
    else:
        cfgs = [headline_cfg, parity_cfg]

    results = []
    for c in cfgs:
        sps = _measure(
            c["n_envs"], T, iters, c["dtype"], c["remat"], c["chunks"],
            c["fused"],
        )
        results.append((c, sps))

    base_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "reference_baseline.json"
    )
    try:
        with open(base_path) as f:
            base = json.load(f)["train_env_steps_per_s"]
    except Exception:
        base = None

    head_cfg, head_sps = results[0]
    line = {
        "metric": "mappo_train_env_steps_per_s_1chip",
        "value": round(head_sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(head_sps / base, 1) if base else None,
        "dtype": head_cfg["dtype"],
        "n_envs": head_cfg["n_envs"],
        "update_chunks": head_cfg["chunks"],
        "fused_trunk": head_cfg["fused"],
        "remat": head_cfg["remat"],
        "episode_length": T,
    }
    for c, sps in results[1:]:
        line[f"{c['dtype']}_value"] = round(sps, 1)
        line[f"{c['dtype']}_vs_baseline"] = (
            round(sps / base, 1) if base else None
        )
        line[f"{c['dtype']}_n_envs"] = c["n_envs"]
    print(json.dumps(line))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
