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
    it = [r["iteration"] for r in rows]

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


if __name__ == "__main__":
    main()
