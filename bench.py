"""Headline benchmark: full MAPPO training throughput on one TPU chip.

Measures env-steps/s of the complete training iteration (fresh-reset rollout
of vmapped envs x 150 steps + GAE + 15-epoch PPO update, all in one jitted
program) on the default 4-UAV / 20-PoI config, in two configurations:

* **bfloat16 production config (the headline)** — 16384 envs, mixed
  precision (bf16 matmuls on the MXU, f32 master weights / distributions /
  losses), the fully-fused Pallas PPO loss+gradient kernels
  (dcc_tpu/ops/fused_ppo, auto-selected; they bypass the configured
  update_chunks — nothing row-sized is materialized). The fastest measured
  single-chip configuration (benchmarks/PERF_NOTES.md).
* **float32 parity config** — 4096 envs, full float32 with stock autodiff
  (fused_loss "auto" resolves OFF for f32 since the round-4 robustness
  study; the faster fused-f32 number is available via
  BENCH_FUSED_LOSS=on) — the reference-semantics configuration.

Also measures the two phase-isolated rates of BASELINE config #4 at the
headline shape:

* **env-only** — the bare vmapped ``step_batch`` scan (no policy, no
  update): pure environment-stepping throughput, the counterpart of the
  reference's 959.7 steps/s env farm (benchmarks/reference_baseline.json
  ``env_only_steps_per_s``).
* **rollout-only** — ``MAPPO.rollout`` (policy act + env step + trajectory
  store, no PPO update).

Baseline: the reference implementation's full pipeline measured on this
host's CPU (benchmarks/reference_baseline.json; the reference is
Python+torch with a synchronous env farm and publishes no numbers of its
own — see BASELINE.md). The baseline runs float32; the float32_* fields are
the apples-to-apples comparison, the headline is the production number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "dtype",
"n_envs", "update_chunks", "fused_trunk", "env_only_steps_per_s",
"rollout_steps_per_s", "float32_value", "float32_vs_baseline", ...}.

Also measures the headline configuration under a 1-device
``jax.sharding.Mesh`` (``mesh1_value``): that run executes the shard_map'd
mesh program — the fused kernels per shard, psum'd gradients — so the field
certifies the per-chip rate the multi-chip path actually carries (round-3
VERDICT item 1; the kernels previously turned themselves off under any
mesh).

Override knobs (honored in every mode): BENCH_ENVS / BENCH_T / BENCH_ITERS
/ BENCH_CHUNKS / BENCH_FUSED / BENCH_FUSED_LOSS / BENCH_BLOCK_ROWS /
BENCH_REMAT apply to the headline configuration; BENCH_DTYPE=
float32|bfloat16 restricts the run to that single configuration;
BENCH_SKIP_PHASES=1 skips the env-only/rollout measurements;
BENCH_SKIP_MESH=1 skips the mesh-of-1 measurement.
"""

import json
import os
import sys
import time


class Rate:
    """steps/s statistics over k timed repetitions: median + min/max.

    A single-shot number through the tunneled backend can swing 3x
    run-to-run (round-4 VERDICT weak #4), so every reported field carries
    its within-run dispersion; round-to-round comparisons should quote the
    median and check the intervals overlap."""

    def __init__(self, n_steps, times):
        times = sorted(times)
        self.median = n_steps / times[len(times) // 2]
        self.min = n_steps / times[-1]  # slowest rep -> lowest rate
        self.max = n_steps / times[0]
        self.median_time_s = times[len(times) // 2]

    def __float__(self):
        return self.median

    def minmax(self):
        return [round(self.min, 1), round(self.max, 1)]


def _sync_median_rate(fn, args, n_steps, iters):
    """Rate stats of fn(*args) over `iters` timed calls (2 warmups).
    NB: on the tunneled TPU backend block_until_ready can return before
    remote execution finishes, so synchronize with an actual device->host
    scalar fetch done by the caller-provided fn."""
    for _ in range(2):
        fn(*args)
    times = []
    for _ in range(iters):
        t0 = time.time()
        fn(*args)
        times.append(time.time() - t0)
    return Rate(n_steps, times)


def _build(n_envs, T, dtype, remat, chunks, fused, block_rows,
           fused_loss="auto", mesh=None):
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
        fused_loss=fused_loss,
        **({"fused_block_rows": block_rows} if block_rows else {}),
    )
    algo = MAPPO(cfg, EnvConfig(), mesh=mesh)
    ts = algo.init_state(jax.random.PRNGKey(0))
    if mesh is not None:
        from dcc_tpu.parallel import replicated

        ts = jax.device_put(ts, replicated(mesh))
    return algo, ts


def _measure_train(algo, ts, n_envs, T, iters):
    import jax

    train = jax.jit(algo.train_iteration)
    key = jax.random.PRNGKey(1)

    state = {"ts": ts}

    def step():
        state["ts"], m = train(state["ts"], key)
        float(m.reward)  # hard sync (device->host scalar)

    return _sync_median_rate(step, (), n_envs * T, iters)


def _measure_rollout(algo, ts, n_envs, T, iters):
    import jax

    roll = jax.jit(lambda ts, k: algo.rollout(ts, k, n_envs))
    key = jax.random.PRNGKey(2)

    def step():
        traj = roll(ts, key)
        float(traj.rewards[0, 0, 0])  # sync on a small leaf

    return _sync_median_rate(step, (), n_envs * T, iters)


def _measure_env_only(n_envs, T, iters):
    """Bare env throughput: scan `step_batch` T times over n_envs vmapped
    envs with a fixed action batch — no policy, no storage."""
    import jax
    import jax.numpy as jnp

    from dcc_tpu.envs import EnvConfig, reset_batch, step_batch

    env_cfg = EnvConfig()

    @jax.jit
    def run(key):
        states = reset_batch(env_cfg, key, n_envs)
        actions = jnp.full(
            (n_envs, env_cfg.n_agents, 2), 0.3, jnp.float32
        )

        def body(s, _):
            s, out = step_batch(env_cfg, s, actions)
            return s, out.reward.sum()

        _, rews = jax.lax.scan(body, states, None, length=T)
        return rews.sum()

    key = jax.random.PRNGKey(3)

    def step():
        float(run(key))  # scalar fetch = hard sync

    return _sync_median_rate(step, (), n_envs * T, iters)


_PEAKS = {
    # chip kind -> (dense peak FLOPs/s at bf16, HBM GB/s). Public spec-sheet
    # numbers; used only to anchor the achieved rates as a utilization %.
    "TPU v5 lite": (394e12, 819.0),
    "TPU v5e": (394e12, 819.0),
    "TPU v4": (275e12, 1228.0),
    "TPU v6 lite": (918e12, 1640.0),
    "TPU v6e": (918e12, 1640.0),
}


def _roofline(algo, n_envs, T, iter_time_s, rollout_time_s):
    """Analytic MFU / HBM-bandwidth utilization for the PPO update phase.

    FLOP and byte counts follow benchmarks/PERF_NOTES.md's round-4
    arithmetic: matmul-chain FLOPs only (fwd + ~2x bwd = 3x forward), actor
    rows R = T*E*A over the (obs->h, h->h) trunk + head, critic rows
    Rv = T*E over the (share_obs->h, h->h) trunk; per-epoch HBM traffic =
    input rows once (the fused kernels keep activations in VMEM). Both are
    lower bounds on work, so the utilization figures are conservative.
    """
    import jax

    env_cfg = algo.env_cfg
    c = algo.cfg
    h = c.hidden_size
    A, din, dcent = env_cfg.n_agents, env_cfg.obs_dim, env_cfg.share_obs_dim
    act_w = env_cfg.action_dim
    R = T * n_envs * A
    Rv = T * n_envs
    actor_fwd = 2 * (din * h + h * h + h * act_w) * R
    critic_fwd = 2 * (dcent * h + h * h + h) * Rv
    epochs = c.ppo_epoch * c.num_mini_batch
    update_flops = 3 * (actor_fwd + critic_fwd) * epochs
    # rollout: actor fwd per step + critic fwd on T+1 rows for values
    rollout_flops = actor_fwd + critic_fwd * (T + 1) / T
    bytes_el = 2 if c.compute_dtype in ("bfloat16", "bf16") else 4
    update_bytes = (R * din + Rv * dcent) * bytes_el * epochs \
        + (5 * R + 3 * Rv) * 4 * epochs
    update_time = max(iter_time_s - rollout_time_s, 1e-9)
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAKS.items() if k in kind), None)
    out = {
        "update_time_s": round(update_time, 4),
        "update_tflops": round(update_flops / 1e12, 2),
        "achieved_tflops_per_s": round(update_flops / update_time / 1e12, 1),
        "achieved_hbm_gbps": round(update_bytes / update_time / 1e9, 1),
        "full_iter_tflops_per_s": round(
            (update_flops + rollout_flops) / iter_time_s / 1e12, 1
        ),
        "device_kind": kind,
    }
    if peak:
        out["update_mfu_pct"] = round(100 * update_flops / update_time / peak[0], 1)
        out["update_membw_pct"] = round(
            100 * update_bytes / update_time / (peak[1] * 1e9), 1
        )
    return out


def main():
    if os.environ.get("BENCH_PLATFORM"):  # smoke-test hook (chip may be busy)
        import jax

        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    T = int(os.environ.get("BENCH_T", "150"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    only = os.environ.get("BENCH_DTYPE")  # float32|bfloat16 -> one config

    # The two standing configurations (see module docstring).
    headline_cfg = dict(
        n_envs=16384, dtype="bfloat16", chunks=4, fused="auto", remat=False
    )
    parity_cfg = dict(
        n_envs=4096, dtype="float32", chunks=1, fused="auto", remat=False
    )
    # env overrides reshape the headline configuration in every mode
    headline_cfg.update(
        n_envs=int(os.environ.get("BENCH_ENVS", headline_cfg["n_envs"])),
        chunks=int(os.environ.get("BENCH_CHUNKS", headline_cfg["chunks"])),
        fused=os.environ.get("BENCH_FUSED", headline_cfg["fused"]),
        fused_loss=os.environ.get("BENCH_FUSED_LOSS", "auto"),
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
    )
    parity_cfg["fused_loss"] = os.environ.get("BENCH_FUSED_LOSS", "auto")
    block_rows = int(os.environ.get("BENCH_BLOCK_ROWS", "0"))  # 0 = config default
    if only:
        base_cfg = headline_cfg if only.startswith("b") else dict(
            parity_cfg,
            n_envs=int(os.environ.get("BENCH_ENVS", parity_cfg["n_envs"])),
            chunks=int(os.environ.get("BENCH_CHUNKS", parity_cfg["chunks"])),
            fused=os.environ.get("BENCH_FUSED", parity_cfg["fused"]),
            remat=os.environ.get("BENCH_REMAT", "0") == "1",
        )
        cfgs = [dict(base_cfg, dtype=only)]
    else:
        cfgs = [headline_cfg, parity_cfg]

    results = []
    phase_rates = {}
    head_algo = None
    for i, c in enumerate(cfgs):
        algo, ts = _build(
            c["n_envs"], T, c["dtype"], c["remat"], c["chunks"], c["fused"],
            block_rows, fused_loss=c.get("fused_loss", "auto"),
        )
        if i == 0:
            head_algo = algo
        sps = _measure_train(algo, ts, c["n_envs"], T, iters)
        results.append((c, sps))
        if i == 0 and os.environ.get("BENCH_SKIP_PHASES", "0") != "1":
            # phase-isolated rates at the headline shape (BASELINE config #4)
            roll = _measure_rollout(algo, ts, c["n_envs"], T, iters)
            env = _measure_env_only(c["n_envs"], T, iters)
            phase_rates["rollout_steps_per_s"] = round(roll.median, 1)
            phase_rates["rollout_steps_per_s_minmax"] = roll.minmax()
            phase_rates["env_only_steps_per_s"] = round(env.median, 1)
            phase_rates["env_only_steps_per_s_minmax"] = env.minmax()
            phase_rates.update(
                _roofline(
                    algo, c["n_envs"], T, sps.median_time_s, roll.median_time_s
                )
            )

    mesh1_sps = None
    if os.environ.get("BENCH_SKIP_MESH", "0") != "1":
        # headline configuration under a 1-device Mesh: runs the
        # shard_map'd mesh program (fused kernels per shard + psum'd
        # gradients) — the per-chip rate the multi-chip path carries
        import jax

        from dcc_tpu.parallel import make_mesh

        c = cfgs[0]
        algo_m, ts_m = _build(
            c["n_envs"], T, c["dtype"], c["remat"], c["chunks"], c["fused"],
            block_rows, fused_loss=c.get("fused_loss", "auto"),
            mesh=make_mesh(jax.devices()[:1]),
        )
        mesh1_sps = _measure_train(algo_m, ts_m, c["n_envs"], T, iters)

    base_path = os.path.join(
        os.path.dirname(__file__), "benchmarks", "reference_baseline.json"
    )
    try:
        with open(base_path) as f:
            ref = json.load(f)
        base = ref["train_env_steps_per_s"]
        env_base = ref.get("env_only_steps_per_s")
    except Exception:
        base = env_base = None

    head_cfg, head_sps = results[0]
    line = {
        "metric": "mappo_train_env_steps_per_s_1chip",
        "value": round(head_sps.median, 1),
        "value_minmax": head_sps.minmax(),
        "bench_reps": iters,
        "unit": "env-steps/s",
        "vs_baseline": round(head_sps.median / base, 1) if base else None,
        "dtype": head_cfg["dtype"],
        "n_envs": head_cfg["n_envs"],
        # dispatch fields read off the BUILT algo, not the requested config
        # (round-3 ADVICE): "kernel" = the fused Pallas path actually ran.
        # The fused-loss kernels bypass gradient-accumulation chunking
        # (nothing row-sized is materialized), hence chunks_effective.
        "fused_loss": "kernel" if head_algo._fused_loss else "off",
        "update_chunks": head_cfg["chunks"],
        "update_chunks_effective": (
            1 if head_algo._fused_loss else head_cfg["chunks"]
        ),
        "fused_trunk": "kernel" if head_algo.actor.fused else "off",
        "fused_fold": bool(head_algo.cfg.fused_fold),
        "remat": head_cfg["remat"],
        "episode_length": T,
    }
    line.update(phase_rates)
    if mesh1_sps is not None:
        line["mesh1_value"] = round(mesh1_sps.median, 1)
        line["mesh1_minmax"] = mesh1_sps.minmax()
        line["mesh1_vs_nomesh"] = round(mesh1_sps.median / head_sps.median, 3)
    if "env_only_steps_per_s" in phase_rates and env_base:
        line["env_only_vs_baseline"] = round(
            phase_rates["env_only_steps_per_s"] / env_base, 1
        )
    for c, sps in results[1:]:
        line[f"{c['dtype']}_value"] = round(sps.median, 1)
        line[f"{c['dtype']}_minmax"] = sps.minmax()
        line[f"{c['dtype']}_vs_baseline"] = (
            round(sps.median / base, 1) if base else None
        )
        line[f"{c['dtype']}_n_envs"] = c["n_envs"]
    print(json.dumps(line))
    sys.stdout.flush()
    os._exit(0)


if __name__ == "__main__":
    main()
