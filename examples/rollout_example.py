#!/usr/bin/env python
"""Env rollout example — the reference's
`examples/waypoint_suite_env_example.ipynb` as a script: roll the validation
suite with a constant action `[1, 0]` until the episode ends and write a
video of the high-res egocentric view.

Usage:
    python examples/rollout_example.py [--out rendered_video.avi]
"""

import argparse
import os
import sys

# standalone execution without pip-install: repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env.gym_adapter import TpuGymEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="rendered_video.avi")
    ap.add_argument("--suite", default="val")
    args = ap.parse_args()

    cfg = EnvConfig(seed=42, render_mode="video", video_filename=args.out,
                    video_res=512, video_fov=120.0)
    env = TpuGymEnv(cfg, data=args.suite)
    obs, _ = env.reset()
    total, steps = 0.0, 0
    while True:
        obs, reward, terminated, truncated, info = env.step(
            np.array([1.0, 0.0], np.float32))
        total += reward
        steps += 1
        if terminated or truncated:
            break
    print(f"episode ended after {steps} steps, return {total:.1f}, "
          f"info: { {k: np.asarray(v).tolist() for k, v in info.items()} }")
    env.close()
    print(f"video written to {args.out}")


if __name__ == "__main__":
    main()
