"""Headline benchmark: full MAPPO training throughput on one TPU chip.

Measures env-steps/s of the complete training iteration (fresh-reset rollout
of 4096 vmapped envs x 150 steps + GAE + 15-epoch PPO update, all in one
jitted program) on the default 4-UAV / 20-PoI config.

Baseline: the reference implementation's full pipeline measured on this
host's CPU (benchmarks/reference_baseline.json; the reference is
Python+torch with a synchronous env farm and publishes no numbers of its
own — see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time


def main():
    import jax

    from dcc_tpu.algos import MAPPO, MAPPOConfig
    from dcc_tpu.envs import EnvConfig

    n_envs = int(os.environ.get("BENCH_ENVS", "4096"))
    T = int(os.environ.get("BENCH_T", "150"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    remat = os.environ.get("BENCH_REMAT", "0") == "1"
    # Mixed precision (bf16 trunk matmuls on the MXU, f32 master weights /
    # losses) is the production default on TPU; BENCH_DTYPE=float32 measures
    # the bit-parity configuration.
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    env_cfg = EnvConfig()
    cfg = MAPPOConfig(
        n_rollout_threads=n_envs,
        episode_length=T,
        use_remat=remat,
        compute_dtype=dtype,
    )
    algo = MAPPO(cfg, env_cfg)
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
    steps_per_s = n_envs * T / dt

    base_path = os.path.join(os.path.dirname(__file__), "benchmarks", "reference_baseline.json")
    vs = None
    try:
        with open(base_path) as f:
            base = json.load(f)["train_env_steps_per_s"]
        vs = steps_per_s / base
    except Exception:
        vs = None

    print(
        json.dumps(
            {
                "metric": "mappo_train_env_steps_per_s_1chip",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(vs, 1) if vs is not None else None,
            }
        )
    )
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
