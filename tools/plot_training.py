#!/usr/bin/env python
"""Render a learning-curve figure from a training JSONL log.

Reads the MetricLogger JSONL stream (rl/train.py) and writes a PNG with
three single-axis panels sharing the env-step x-axis:
  1. episode reward (validation + training eval)
  2. success percentage (validation + training eval)
  3. reached waypoints (validation + training eval)

Usage:
    python tools/plot_training.py artifacts/runs/sac-*.jsonl \
        --out artifacts/sac_curve.png --title "SAC multi-agent (1e6 steps)"
"""

import argparse
import glob
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# categorical slots 1/2 of the validated default palette (dataviz skill
# reference instance): adjacent-pair CVD dE >= 8, normal-vision dE >= 15
BLUE = "#2a78d6"
ORANGE = "#eb6834"
INK = "#333330"
MUTED = "#8a8a80"


def load(path):
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    return rows


def series(rows, key):
    xs, ys = [], []
    for r in rows:
        if key in r:
            xs.append(r["step"])
            ys.append(r[key])
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="JSONL path (glob ok)")
    ap.add_argument("--out", default="training_curve.png")
    ap.add_argument("--title", default=None)
    args = ap.parse_args()

    paths = sorted(glob.glob(args.log))
    if not paths:
        raise SystemExit(f"no log matches {args.log}")
    rows = []
    for p in paths:
        rows.extend(load(p))
    rows.sort(key=lambda r: r.get("step", 0))

    panels = [
        ("episode reward", "eval/mean_episode_reward",
         "eval_train/mean_episode_reward"),
        ("success percentage", "eval/success_percentage",
         "eval_train/success_percentage"),
        ("reached waypoints", "eval/reached_waypoint_num",
         "eval_train/reached_waypoint_num"),
    ]
    fig, axes = plt.subplots(1, 3, figsize=(12.5, 3.4), dpi=150)
    for ax, (name, k_val, k_train) in zip(axes, panels):
        for key, color, label in [(k_val, BLUE, "validation"),
                                  (k_train, ORANGE, "training suite")]:
            xs, ys = series(rows, key)
            if xs:
                ax.plot(xs, ys, color=color, lw=2.0, label=label)
        ax.set_title(name, fontsize=10, color=INK, loc="left")
        ax.set_xlabel("env steps", fontsize=8, color=MUTED)
        ax.tick_params(labelsize=8, colors=MUTED)
        ax.grid(True, color="#e6e6e0", lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#d0d0c8")
        ax.margins(x=0.02)
    axes[0].legend(fontsize=8, frameon=False, loc="upper left")
    if args.title:
        fig.suptitle(args.title, fontsize=11, color=INK, x=0.01,
                     ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.93) if args.title else None)
    fig.savefig(args.out, bbox_inches="tight")
    print(f"wrote {args.out} ({len(rows)} log rows)")


if __name__ == "__main__":
    main()
