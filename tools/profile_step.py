#!/usr/bin/env python
"""Micro-profiler: time individual pieces of the batched step on the current
backend (TPU by default). Guides kernel-optimization work; not part of the
public API."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env import core
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.npc.route_follow import npc_actions
from torchdriveenv_tpu.ops import rasterizer


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:10.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()
    B = args.num_envs
    cfg = EnvConfig()
    assets = load_assets("train")
    reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    _, step_nr = make_env_fns(cfg, assets, render=False)

    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    state, obs = jax.jit(reset_fn)(keys)
    actions = jnp.tile(jnp.array([[0.3, 0.0]]), (B, 1))

    print(f"batch={B} backend={jax.devices()[0].platform}")

    timeit("full step (render)", jax.jit(lambda s: step_fn(s, actions)), state)
    timeit("full step (no render)", jax.jit(lambda s: step_nr(s, actions)), state)

    # pure reset (the auto-reset branch runs under vmapped cond every step)
    timeit("reset only", jax.jit(lambda k: jax.vmap(
        lambda kk: core.reset(cfg, assets, kk))(k)), keys)

    # raw step without auto-reset machinery
    raw = jax.vmap(lambda s, a: core.step(cfg, assets, s, a)[0],
                   in_axes=(0, 0))
    timeit("core.step only (no autoreset)",
           jax.jit(lambda s: raw(s, actions)), state)

    # npc controller alone
    t = state.time0 + state.step_idx.astype(jnp.float32) * 0.1
    npc = jax.vmap(lambda tn, s: npc_actions(
        assets.maps, s.town, tn, s.agent_states, s.agent_attrs, s.present,
        s.npc_target_speed))
    timeit("npc_actions", jax.jit(lambda s: npc(t, s)), state)

    # rasterizer alone
    rend = jax.vmap(lambda s: rasterizer.render_egocentric(
        assets.maps, s.town, s.time0, s.agent_states, s.agent_attrs,
        s.present, assets.suite.waypoints[s.case], s.target_idx,
        assets.suite.n_waypoints[s.case]))
    timeit("render_egocentric", jax.jit(rend), state)

    # rasterizer with road layer forced constant (isolates the SDF gather)
    orig = rasterizer._sample_sdf_nearest
    try:
        rasterizer._sample_sdf_nearest = lambda m, tn, xy: jnp.ones(xy.shape[:-1])
        rend_c = jax.vmap(lambda s: rasterizer.render_egocentric(
            assets.maps, s.town, s.time0, s.agent_states, s.agent_attrs,
            s.present, assets.suite.waypoints[s.case], s.target_idx,
            assets.suite.n_waypoints[s.case]))
        timeit("render (road=const, no SDF gather)", jax.jit(rend_c), state)
    finally:
        rasterizer._sample_sdf_nearest = orig


if __name__ == "__main__":
    main()
