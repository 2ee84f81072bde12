#!/usr/bin/env python
"""Headline benchmark: lockstep env throughput (steps/s/chip, 4096 envs).

Runs the full batched env step — bicycle kinematics for up to 96 agents/env,
NPC controllers, OBB collision, SDF offroad, traffic lights, waypoint
reward, 3x64x64 birdview rasterization, in-graph auto-reset — under a
`lax.scan`, and reports env-steps/s on one chip.

Baseline: the driver-set north star of 100k env-steps/s/chip at 4096 envs
(BASELINE.md; the reference publishes no throughput numbers — its
SubprocVecEnv stack runs ~10 envs per host at ~10-100 steps/s each).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 100_000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=64, help="steps per timed scan")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--no_render", action="store_true")
    args = ap.parse_args()

    from torchdriveenv_tpu.config import EnvConfig
    from torchdriveenv_tpu.env.batched import make_env_fns
    from torchdriveenv_tpu.maps.arrays import load_assets

    cfg = EnvConfig()
    assets = load_assets("train")
    reset_fn, step_fn = make_env_fns(cfg, assets, render=not args.no_render)

    def chunk_fn(state, _):
        actions = jnp.tile(jnp.array([[0.3, 0.0]]), (args.num_envs, 1))

        def one(state, _):
            out = step_fn(state, actions)
            # fold obs into a cheap checksum so rendering can't be DCE'd
            return out.state, (out.reward.sum(), out.obs.sum() if out.obs.size
                               else jnp.zeros((), jnp.uint8))

        state, (r, o) = jax.lax.scan(one, state, None, length=args.chunk)
        return state, (r[-1], o[-1])

    run = jax.jit(chunk_fn, donate_argnums=(0,))

    print(f"devices: {jax.devices()}", file=sys.stderr)
    key = jax.random.PRNGKey(0)
    state, _ = jax.jit(reset_fn)(jax.random.split(key, args.num_envs))

    t0 = time.time()
    state, _ = jax.block_until_ready(run(state, None))
    print(f"compile+first chunk: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        state, _ = jax.block_until_ready(run(state, None))
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = args.num_envs * args.chunk / best
    print(f"per-chunk times: {[f'{t:.3f}' for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": "env_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 1),
        "unit": f"env-steps/s ({args.num_envs} envs, render={not args.no_render})",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
