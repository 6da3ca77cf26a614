"""Overlay the reference's and dcc_tpu's learning curves (the north-star
parity artifact, BASELINE.md "Fidelity" row).

Reads benchmarks/learning_curves/{reference,dcc_tpu}_seed*.json (produced by
scripts/run_reference_curve.py and scripts/run_dcc_curve.py) and writes

* curves_overlay.png — coverage-rate and reward vs iteration, per-seed thin
  lines + per-system mean, reference vs dcc_tpu
* parity_summary.json — band statistics (final-coverage mean/std per system,
  gap, per-seed values) consumed by tests/test_curve_parity.py

Usage: python scripts/plot_curves.py [CURVE_DIR]
"""

import glob
import json
import os
import sys

import numpy as np
from scipy.stats import mannwhitneyu  # fail fast, before artifacts write

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# categorical slots 1-2 (light mode) of the validated default palette
COLORS = {"reference": "#2a78d6", "dcc_tpu": "#eb6834"}
INK = "#333639"
MUTED = "#6b7075"


def load_series(curve_dir, system):
    out = {}
    for path in sorted(glob.glob(os.path.join(curve_dir, f"{system}_seed*.json"))):
        d = json.load(open(path))
        if len(d["series"]["coverage_rate"]) < int(d["n_iters"]):
            continue  # partial (still-running / aborted) record
        out[int(d["seed"])] = d["series"]
    return out


def smooth(x, w=10):
    """Trailing moving average (the reference README's curves are smoothed)."""
    x = np.asarray(x, dtype=float)
    c = np.cumsum(np.insert(x, 0, 0.0))
    n = np.minimum(np.arange(1, len(x) + 1), w)
    return (c[np.arange(1, len(x) + 1)] - c[np.maximum(np.arange(len(x)) - w + 1, 0)]) / n


def band_stats(series, metric, last=20):
    vals = {s: float(np.mean(ser[metric][-last:])) for s, ser in series.items()}
    arr = np.array(list(vals.values()))
    return {
        "per_seed": vals,
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "max": float(arr.max()),
        "n_seeds": len(vals),
        "window": f"last {last} iters",
    }


def main():
    curve_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "benchmarks", "learning_curves")
    )
    plot_variant(curve_dir, "default")
    # connectivity-preservation variant (BASELINE config #2 behavior), if
    # its artifacts exist
    if glob.glob(os.path.join(curve_dir, "reference_connect_seed*.json")):
        plot_variant(curve_dir, "connect")


def plot_variant(curve_dir, variant):
    suffix = "" if variant == "default" else f"_{variant}"
    stems = ("reference" + suffix, "dcc_tpu" + suffix)
    data = {s: load_series(curve_dir, s) for s in stems}
    for s, d in data.items():
        if not d:
            raise SystemExit(f"no {s}_seed*.json found in {curve_dir}")
    data = {"reference": data[stems[0]], "dcc_tpu": data[stems[1]]}

    fig, axes = plt.subplots(1, 2, figsize=(11, 4.2), dpi=150)
    fig.patch.set_facecolor("white")
    for ax, metric, title in zip(
        axes,
        ("coverage_rate", "reward"),
        ("Coverage rate (max over episode, mean over envs)", "Episode reward"),
    ):
        ends = []  # (endpoint_y, x, label, color) for collision-aware labels
        for system, seeds in data.items():
            c = COLORS[system]
            curves = []
            for seed, ser in sorted(seeds.items()):
                y = smooth(ser[metric])
                curves.append(y)
                ax.plot(
                    np.arange(1, len(y) + 1), y, color=c, lw=0.8, alpha=0.30
                )
            n = min(len(c_) for c_ in curves)
            mean = np.mean([c_[:n] for c_ in curves], axis=0)
            ax.plot(
                np.arange(1, n + 1),
                mean,
                color=c,
                lw=2.0,
                label=f"{system} (n={len(curves)})",
            )
            ends.append((mean[-1], n, system, c))
        # direct end labels, nudged apart when the means coincide
        ends.sort()
        ylo, yhi = ax.get_ylim()
        min_sep = 0.045 * (yhi - ylo)
        ys = [e[0] for e in ends]
        for i in range(1, len(ys)):
            if ys[i] - ys[i - 1] < min_sep:
                ys[i] = ys[i - 1] + min_sep
        for (y0, x, label, c), y in zip(ends, ys):
            ax.annotate(
                label, (x, y), xytext=(4, 0), textcoords="offset points",
                color=c, fontsize=9, va="center",
            )
        ax.set_title(title, fontsize=10, color=INK, loc="left")
        ax.set_xlabel("training iteration", fontsize=9, color=MUTED)
        ax.tick_params(colors=MUTED, labelsize=8)
        ax.grid(True, color="#e4e6e8", lw=0.6)
        for side in ("top", "right"):
            ax.spines[side].set_visible(False)
        for side in ("left", "bottom"):
            ax.spines[side].set_color("#c9ccd0")
        ax.margins(x=0.02)
    axes[0].set_ylim(0, 1)
    axes[0].legend(frameon=False, fontsize=8, loc="lower right")
    desc = (
        "default config: 4 UAV, 20 PoI, 16 envs x 150 steps"
        if variant == "default"
        else "connectivity-preservation ON (comm_force_scale=5), 4 UAV, 20 PoI"
    )
    fig.suptitle(
        "MAPPO coverage learning curves: torch reference vs dcc_tpu "
        f"({desc}, 10-iter smoothing)",
        fontsize=10,
        color=INK,
        x=0.02,
        ha="left",
    )
    fig.tight_layout(rect=(0, 0, 1, 0.93))
    png = os.path.join(curve_dir, f"curves_overlay{suffix}.png")
    fig.savefig(png, facecolor="white")
    print(f"wrote {png}")

    summary = {
        "metric": "coverage_rate",
        "reference": band_stats(data["reference"], "coverage_rate"),
        "dcc_tpu": band_stats(data["dcc_tpu"], "coverage_rate"),
        "reward_reference": band_stats(data["reference"], "reward"),
        "reward_dcc_tpu": band_stats(data["dcc_tpu"], "reward"),
    }
    summary["gap"] = summary["dcc_tpu"]["mean"] - summary["reference"]["mean"]
    # distribution-level comparison (round-3 VERDICT weak #1): two-sided
    # Mann-Whitney U of the final-coverage seed distributions — the same
    # statistic tests/test_curve_parity.py gates on
    def mwu(a_stats, b_stats):
        a = list(a_stats["per_seed"].values())
        b = list(b_stats["per_seed"].values())
        return float(mannwhitneyu(a, b, alternative="two-sided").pvalue)

    summary["mannwhitney_p"] = mwu(summary["reference"], summary["dcc_tpu"])
    if variant == "connect":
        # fidelity-hypothesis arm: f64 physics (env_dtype=float64) on the
        # connect config — tests whether the f32 training env explains the
        # connect-config attainment gap
        envf64 = load_series(curve_dir, "dcc_tpu_connect_envf64")
        if envf64:
            summary["dcc_tpu_envf64"] = band_stats(envf64, "coverage_rate")
            summary["mannwhitney_p_envf64_vs_reference"] = mwu(
                summary["reference"], summary["dcc_tpu_envf64"]
            )
            summary["mannwhitney_p_envf64_vs_f32"] = mwu(
                summary["dcc_tpu"], summary["dcc_tpu_envf64"]
            )
    if variant == "default":
        # the fused-kernel robustness study arms (round-4): the default
        # dcc_tpu arm is the SHIPPED f32 config (stock autodiff since the
        # study); "fusedf32" = fused_loss forced on at f32, "bf16" = the
        # bf16 production config (fused kernels on). Each arm gets its
        # band + MWU vs the reference and vs the default arm.
        for arm in ("fusedf32", "bf16", "stockhi"):
            series = load_series(curve_dir, f"dcc_tpu_{arm}")
            if series:
                summary[f"dcc_tpu_{arm}"] = band_stats(series, "coverage_rate")
                summary[f"mannwhitney_p_{arm}_vs_reference"] = mwu(
                    summary["reference"], summary[f"dcc_tpu_{arm}"]
                )
                summary[f"mannwhitney_p_{arm}_vs_default"] = mwu(
                    summary["dcc_tpu"], summary[f"dcc_tpu_{arm}"]
                )
    out = os.path.join(curve_dir, f"parity_summary{suffix}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out}")
    print(
        f"final coverage: reference {summary['reference']['mean']:.3f}"
        f" +/- {summary['reference']['std']:.3f} | dcc_tpu "
        f"{summary['dcc_tpu']['mean']:.3f} +/- {summary['dcc_tpu']['std']:.3f}"
    )


if __name__ == "__main__":
    main()
