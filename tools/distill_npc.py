#!/usr/bin/env python
"""Distill the GRU NPC policy (npc/policy_net.py) from the deterministic IDM
route-follower and bundle the parameters into the package assets.

The bundled parameters make `EnvConfig(npc_mode="policy")` behave like the
rule controller out of the box; fine-tune or retrain on logged trajectories
for more realism."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from torchdriveenv_tpu.maps.arrays import load_assets
    from torchdriveenv_tpu.npc import policy_net

    assets = load_assets("train")
    params, loss = policy_net.distill(assets, steps=args.steps,
                                      batch=args.batch, lr=args.lr)
    policy_net.save_params(params, args.out)
    print(f"distilled {args.steps} steps, final imitation MSE {loss:.4f} -> "
          f"{args.out or policy_net.params_path()}")


if __name__ == "__main__":
    main()
