#!/usr/bin/env python
"""Evaluate every model_<step> checkpoint in a run's checkpoint dir on the
validation suite (per-case success/reached breakdown) and write a JSON
table — the best-checkpoint selector for TRAINING.md.

Usage:
    python tools/eval_checkpoints.py --ckpt_dir artifacts/sac_tpu_ckpt \
        --episodes 50 [--algorithm sac] [--out artifacts/ckpt_sweep.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", required=True)
    ap.add_argument("--algorithm", default="sac")
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--suite", default="val")
    ap.add_argument("--npc_mode", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--last_n", type=int, default=None,
                    help="only the N highest-step checkpoints")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from evaluate_policy import evaluate
    from torchdriveenv_tpu.config import EnvConfig

    names = sorted(
        (n for n in os.listdir(args.ckpt_dir) if n.startswith("model_")),
        key=lambda n: int(n.split("_")[1]))
    if args.last_n:
        names = names[-args.last_n:]
    env_cfg = EnvConfig(npc_mode=args.npc_mode) if args.npc_mode else None

    rows = []
    for n in names:
        m = evaluate(os.path.join(args.ckpt_dir, n), args.algorithm,
                     args.episodes, args.suite, env_cfg=env_cfg)
        row = {"checkpoint": n, "step": int(n.split("_")[1]), **m}
        rows.append(row)
        per_case = " ".join(
            f"c{i}={m.get(f'success_case_{i}', float('nan')):.2f}"
            for i in range(5) if f"success_case_{i}" in m)
        print(f"{n}: success={m['success_percentage']:.3f} "
              f"reach={m['reached_waypoint_num']:.2f} "
              f"len={m['mean_episode_length']:.1f} {per_case}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"-> {args.out}")


if __name__ == "__main__":
    main()
