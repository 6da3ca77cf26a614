"""Headline benchmark: full MAPPO training throughput on one TPU chip.

Measures env-steps/s of the complete training iteration (fresh-reset rollout
of 4096 vmapped envs x 150 steps + GAE + 15-epoch PPO update, all in one
jitted program) on the default 4-UAV / 20-PoI config, in BOTH precision
configurations:

* float32 — the bit-parity configuration (reference semantics end to end)
* bfloat16 — mixed precision (bf16 trunk matmuls on the MXU, f32 master
  weights / distributions / losses), the production default at scale

Baseline: the reference implementation's full pipeline measured on this
host's CPU (benchmarks/reference_baseline.json; the reference is
Python+torch with a synchronous env farm and publishes no numbers of its
own — see BASELINE.md). The baseline runs float32, so the headline
vs_baseline compares float32 against it; the bf16 numbers are reported
alongside, explicitly labeled.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "dtype",
"remat", "bfloat16_value", "bfloat16_vs_baseline", ...}.
"""

import json
import os
import sys
import time


def _measure(n_envs, T, iters, dtype, remat, chunks=1):
    import jax

    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    cfg = MAPPOConfig(
        n_rollout_threads=n_envs,
        episode_length=T,
        use_remat=remat,
        update_chunks=chunks,
        compute_dtype=dtype,
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
    n_envs = int(os.environ.get("BENCH_ENVS", "4096"))
    T = int(os.environ.get("BENCH_T", "150"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    chunks = int(os.environ.get("BENCH_CHUNKS", "1"))
    # BENCH_DTYPE=float32|bfloat16 restricts to one configuration; default
    # measures both (headline = float32, the baseline-comparable config).
    only = os.environ.get("BENCH_DTYPE")

    results = {}
    for dtype in [only] if only else ["float32", "bfloat16"]:
        results[dtype] = _measure(n_envs, T, iters, dtype, remat, chunks)

    base_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "reference_baseline.json"
    )
    base = None
    try:
        with open(base_path) as f:
            base = json.load(f)["train_env_steps_per_s"]
    except Exception:
        base = None

    headline_dtype = only or "float32"
    line = {
        "metric": "mappo_train_env_steps_per_s_1chip",
        "value": round(results[headline_dtype], 1),
        "unit": "env-steps/s",
        "vs_baseline": (
            round(results[headline_dtype] / base, 1) if base else None
        ),
        "dtype": headline_dtype,
        "remat": remat,
        "update_chunks": chunks,
        "n_envs": n_envs,
        "episode_length": T,
    }
    for dtype, v in results.items():
        if dtype != headline_dtype:
            line[f"{dtype}_value"] = round(v, 1)
            line[f"{dtype}_vs_baseline"] = round(v / base, 1) if base else None
    print(json.dumps(line))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
