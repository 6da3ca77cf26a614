"""Run dcc_tpu's FULL training loop on the reference's default config and
record its learning curve (per-iteration reward + coverage_rate + losses).

The dcc_tpu half of the north-star parity artifact (BASELINE.md "Fidelity"
row): `scripts/run_reference_curve.py` records the torch reference's curves
(200 iters x 150 steps x 16 envs, shared MAPPO, seeds 0-2); this script
records ours under the *same run shape* so the two can be overlaid and
band-checked (`scripts/plot_curves.py`, `tests/test_curve_parity.py`).

The metric definitions match the reference's Learner exactly
(``/root/reference/uav_dcc_control/learner.py:191-193,211-214``):
reward = sum over steps of the mean per-env team reward, coverage_rate =
mean over envs of the max coverage over the episode.

Usage: python scripts/run_dcc_curve.py SEED [OUT_DIR]
Writes OUT_DIR/dcc_tpu_seed{SEED}.json with per-iter series.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

# Backend-affecting config updates MUST precede the dcc_tpu import:
# importing it evaluates jnp.asarray in NamedTuple defaults (valuenorm),
# which initializes the backend and freezes jax_platforms.
if os.environ.get("DCC_CURVE_ENV_DTYPE", "").startswith("float64"):
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_platforms", "cpu")  # TPUs have no hardware f64
if os.environ.get("DCC_CURVE_PLATFORM"):  # smoke-test hook (chip may be busy)
    jax.config.update("jax_platforms", os.environ["DCC_CURVE_PLATFORM"])
if os.environ.get("DCC_CURVE_MATMUL_PRECISION"):
    jax.config.update(
        "jax_default_matmul_precision",
        os.environ["DCC_CURVE_MATMUL_PRECISION"],
    )

from dcc_tpu.algos import MAPPO  # noqa: E402
from dcc_tpu.configs.loader import load as load_config  # noqa: E402


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "benchmarks", "learning_curves")
    )
    os.makedirs(out_dir, exist_ok=True)

    overrides = {"seed": seed}
    variant = os.environ.get("DCC_CURVE_CONFIG", "default")
    # DCC_CURVE_ALGO=maddpg: record the MADDPG learning curve (the reference
    # ships MADDPG unwired — algos/maddpg.py dead code — so this band is a
    # SELF-band that pins regressions, not a reference-parity artifact).
    algo_name = os.environ.get("DCC_CURVE_ALGO", "mappo")
    if algo_name != "mappo":
        overrides["algo_file"] = algo_name
    # DCC_CURVE_RECURRENT=1: GRU policy at the same run shape
    # (use_recurrent_policy, reference algos/algo_utils/rnn.py:24-80)
    if os.environ.get("DCC_CURVE_RECURRENT"):
        overrides["use_recurrent_policy"] = True
    # DCC_CURVE_COMPENSATED=1: double-float pull-force chain (ops/df64) —
    # the TPU-runnable analog of the f64-physics fidelity arm
    if os.environ.get("DCC_CURVE_COMPENSATED"):
        overrides["compensated_forces"] = True
    if variant == "connect":
        # connectivity-preservation on: the same 4x20 shape and force
        # strength as scripts/run_reference_curve.py's connect variant
        # (comm_force_scale=5.0; reference pull force CoverageWorld.py:100-140,
        # replicated including the scaled-connectivity quirk —
        # fix_scaled_connectivity stays False)
        overrides["comm_force_scale"] = 5.0
        overrides["comm_r_scale"] = 0.95
    elif variant != "default":
        raise SystemExit(f"unknown DCC_CURVE_CONFIG {variant!r}")
    if os.environ.get("DCC_CURVE_ITERS"):  # smoke-test hook
        overrides["n_iters"] = int(os.environ["DCC_CURVE_ITERS"])
    # A/B hooks for the fused-kernel robustness study (round-3 VERDICT weak
    # #1): DCC_CURVE_FUSED_LOSS=off runs the stock-autodiff update on the
    # same shape; DCC_CURVE_TAG names the output series (e.g. "stock") so
    # the arms don't overwrite each other.
    if os.environ.get("DCC_CURVE_FUSED_LOSS"):
        overrides["fused_loss"] = os.environ["DCC_CURVE_FUSED_LOSS"]
        overrides["fused_trunk"] = os.environ.get(
            "DCC_CURVE_FUSED_TRUNK", os.environ["DCC_CURVE_FUSED_LOSS"]
        )
    if os.environ.get("DCC_CURVE_DTYPE"):
        overrides["compute_dtype"] = os.environ["DCC_CURVE_DTYPE"]
    if os.environ.get("DCC_CURVE_ENV_DTYPE"):
        # fidelity-study arm: f64 physics like the reference's numpy.
        # Requires x64 AND an f64-capable backend — force CPU (TPUs have
        # no hardware double precision).
        overrides["env_dtype"] = os.environ["DCC_CURVE_ENV_DTYPE"]
        if overrides["env_dtype"].startswith("float64"):
            # x64/platform updates already applied at module top (before
            # the dcc_tpu import); keep the TPU-auto kernels out too
            overrides.setdefault("gae_backend", "xla")
    if os.environ.get("DCC_CURVE_OVERRIDES"):  # generic JSON overrides hook
        overrides.update(json.loads(os.environ["DCC_CURVE_OVERRIDES"]))
    # Non-MAPPO arms default their tag to the algo name so a missing
    # DCC_CURVE_TAG can never overwrite the main parity band's artifacts
    # (dcc_tpu_seed*.json) with another algorithm's curves.
    tag = os.environ.get("DCC_CURVE_TAG", "" if algo_name == "mappo" else algo_name)
    cfg, env_cfg, algo_cfg = load_config(overrides)
    n_iters = int(cfg["n_iters"])

    if algo_name == "mappo":
        algo = MAPPO(algo_cfg, env_cfg)
        fields = ["value_loss", "policy_loss", "dist_entropy", "ratio"]
    else:
        from dcc_tpu.algos.factory import make_algo

        algo = make_algo(cfg, env_cfg)
        fields = ["qf_loss", "policy_loss"]
    key = jax.random.PRNGKey(seed)
    ts = algo.init_state(key)
    base_key = jax.random.fold_in(key, 7)

    @jax.jit
    def train(ts, base_key):
        k = jax.random.fold_in(base_key, ts.iteration)
        return algo.train_iteration(ts, k)

    series = {k: [] for k in ["reward", "coverage_rate"] + fields + ["iter_time_s"]}
    t_start = time.time()
    for iter_ in range(1, n_iters + 1):
        t0 = time.time()
        ts, m = train(ts, base_key)
        m = jax.block_until_ready(m)
        dt = time.time() - t0
        if not isinstance(m, dict):  # MAPPO Metrics NamedTuple
            m = {k: getattr(m, k) for k in ["reward", "coverage_rate"] + fields}
        for k in ["reward", "coverage_rate"] + fields:
            series[k].append(float(m[k]))
        series["iter_time_s"].append(round(dt, 4))
        if iter_ % 10 == 0 or iter_ == 1:
            print(
                f"[dcc sd{seed}] iter {iter_}/{n_iters} "
                f"reward {series['reward'][-1]:.1f} "
                f"coverage {series['coverage_rate'][-1]:.3f} ({dt:.2f}s/iter)",
                flush=True,
            )
        if iter_ % 10 == 0 or iter_ == n_iters:
            _dump(out_dir, seed, cfg, series, time.time() - t_start, variant, tag)

    _dump(out_dir, seed, cfg, series, time.time() - t_start, variant, tag)
    print(f"[dcc sd{seed}] done in {time.time() - t_start:.0f}s", flush=True)


def _dump(out_dir, seed, cfg, series, elapsed, variant="default", tag=""):
    payload = {
        "system": f"dcc_tpu (jax, vmap x{cfg['n_rollout_threads']}, "
        f"{jax.default_backend()})",
        "seed": seed,
        "n_iters": int(cfg["n_iters"]),
        "n_rollout_threads": int(cfg["n_rollout_threads"]),
        "max_ep_len": int(cfg["max_ep_len"]),
        "elapsed_s": round(elapsed, 1),
        "series": series,
    }
    stem = "dcc_tpu" if variant == "default" else f"dcc_tpu_{variant}"
    if tag:
        stem = f"{stem}_{tag}"
    path = os.path.join(out_dir, f"{stem}_seed{seed}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


if __name__ == "__main__":
    main()
    # interpreter teardown with the axon TPU plugin can hang; all artifacts
    # are already flushed to disk at this point
    os._exit(0)
