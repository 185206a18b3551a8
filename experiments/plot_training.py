#!/usr/bin/env python
"""Plot a training run's learning curves from metrics.jsonl.

The reference exposes training curves only through W&B/tensorboard
(experiments/run_sarl.py:186-198); this renders the same quantities
(rollout Nusselt, eval Nusselt, losses, entropy) straight from the
MetricsLogger artifact, with optional horizontal baselines from
eval_baselines.py's baseline_eval.json.

Usage:
  python experiments/plot_training.py results/sarl_ra2500 [-o curves.png]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("-o", "--out", default=None,
                   help="output image (default <result_dir>/curves.png)")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = [
        json.loads(line)
        for line in open(os.path.join(args.result_dir, "metrics.jsonl"))
    ]

    def series(key):
        pts = [(r["iteration"], r[key]) for r in rows if key in r]
        return ([p[0] for p in pts], [p[1] for p in pts])

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    ax = axes[0, 0]
    ax.plot(*series("rollout/nusselt_mean"), label="rollout Nu (stochastic)")
    ei, ev = series("eval/nusselt")
    if ei:
        ax.plot(ei, ev, "o-", ms=3, label="eval Nu (greedy)")
    bl_path = os.path.join(args.result_dir, "baseline_eval.json")
    if os.path.isfile(bl_path):
        bl = json.load(open(bl_path))
        for name, color in (("zero", "k"), ("random", "gray")):
            ax.axhline(bl[name]["nusselt_mean_second_half"], color=color,
                       ls="--", lw=1, label=f"{name}-action baseline")
    ax.set_xlabel("iteration")
    ax.set_ylabel("Nusselt")
    ax.legend(fontsize=8)
    ax.set_title("Heat transport (lower = better control)")

    ax = axes[0, 1]
    ax.plot(*series("loss"), label="total")
    ax.plot(*series("policy_loss"), label="policy")
    ax.plot(*series("value_loss"), label="value")
    ax.set_xlabel("iteration")
    ax.set_yscale("symlog")
    ax.legend(fontsize=8)
    ax.set_title("Losses")

    ax = axes[1, 0]
    ax.plot(*series("entropy"))
    ax.set_xlabel("iteration")
    ax.set_title("Policy entropy")

    ax = axes[1, 1]
    ax.plot(*series("approx_kl"), label="approx KL")
    ax.plot(*series("clip_fraction"), label="clip fraction")
    ax.set_xlabel("iteration")
    ax.legend(fontsize=8)
    ax.set_title("PPO diagnostics")

    fig.tight_layout()
    out = args.out or os.path.join(args.result_dir, "curves.png")
    fig.savefig(out, dpi=130)
    print(f"wrote {out}")

    # Per-step eval Nu(t) traces (trained vs baselines), if eval_baselines
    # has been run — the direct visual of the suppression claim.
    if os.path.isfile(bl_path):
        bl = json.load(open(bl_path))
        traces = {
            name: bl[name]["nusselt_trace"]
            for name in ("trained", "zero", "random", "proportional")
            if name in bl and "nusselt_trace" in bl.get(name, {})
        }
        if traces:
            fig2, ax = plt.subplots(figsize=(8, 4.5))
            styles = {"trained": ("C0", "-"), "zero": ("k", "--"),
                      "random": ("gray", ":"), "proportional": ("C2", "-.")}
            for name, tr in traces.items():
                color, ls = styles.get(name, ("C3", "-"))
                ax.plot(tr, color=color, ls=ls, label=name)
            n = len(next(iter(traces.values())))
            ax.axvspan(n // 2, n - 1, alpha=0.08, color="C0",
                       label="scored window (2nd half)")
            supp = bl.get("suppression_vs_zero_pct")
            ci = bl.get("suppression_vs_zero_ci95")
            title = "Held-out eval: Nu(t), mean over episodes"
            if supp is not None and ci:
                title += (f"  —  suppression {supp:.1f}% "
                          f"[{ci[0]:.1f}, {ci[1]:.1f}]")
            ax.set_title(title, fontsize=10)
            ax.set_xlabel("env step")
            ax.set_ylabel("Nusselt")
            ax.legend(fontsize=8)
            fig2.tight_layout()
            out2 = os.path.join(args.result_dir, "eval_traces.png")
            fig2.savefig(out2, dpi=130)
            print(f"wrote {out2}")


if __name__ == "__main__":
    main()
