"""Lockstep batched environment with in-graph auto-reset.

The TPU-native replacement for the reference's `SubprocVecEnv` OS-process
vectorization (reference examples/rl_training.py:159): N envs become a leading
array axis of one jitted step. Episode boundaries are handled *inside* the
step (per-env select between the stepped state and a freshly reset state), so
thousands of envs run in lockstep with no host round-trips.

Functional API (`make_env_fns`) for use under `jax.lax.scan` / `shard_map`,
plus a convenience `BatchedEnv` class holding jitted callables.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env import core
from torchdriveenv_tpu.maps.arrays import Assets
from torchdriveenv_tpu.ops.rasterizer_pallas import render_observation


class StepOutput(NamedTuple):
    state: Any                 # EnvState batch
    obs: jnp.ndarray           # (B, 3, res, res) uint8 (post-auto-reset)
    reward: jnp.ndarray        # (B,)
    terminated: jnp.ndarray    # (B,) bool
    truncated: jnp.ndarray     # (B,) bool
    info: Dict[str, jnp.ndarray]
    # pre-auto-reset obs (the true next/terminal observation; equals `obs`
    # for non-done envs). Populated only when `with_final_obs=True` — needed
    # by SB3-style truncation bootstrapping (rl/buffer.py); the reference
    # exposes it as infos["terminal_observation"] via SB3's VecEnv.
    final_obs: Any = None


def _obs_batched(cfg: EnvConfig, assets: Assets, state: core.EnvState) -> jnp.ndarray:
    """Batched observation render (state carries a leading env axis).

    Dispatches to the fused Pallas rasterizer on TPU and its XLA twin
    elsewhere (ops/rasterizer_pallas.py)."""
    rcfg = cfg.simulator.renderer
    t = state.time0 + state.step_idx.astype(jnp.float32) * cfg.simulator.dt
    return render_observation(
        assets.maps, state.town, t,
        state.agent_states, state.agent_attrs, state.present,
        assets.suite.waypoints[state.case], state.target_idx,
        assets.suite.n_waypoints[state.case],
        res=rcfg.obs_res, fov=rcfg.obs_fov,
        left_handed=rcfg.left_handed_coordinates,
        highlight_ego=rcfg.highlight_ego_vehicle,
        backend=rcfg.backend,
    )


def _select_done(done, fresh, next_state):
    """Per-env pytree select between a fresh reset state and the stepped one."""
    def sel(f, n):
        d = jnp.reshape(done, done.shape + (1,) * (n.ndim - done.ndim))
        return jnp.where(d, f, n)
    return jax.tree.map(sel, fresh, next_state)


def _autoreset(cfg: EnvConfig, assets: Assets, next_state, done):
    """In-graph auto-reset over the batch.

    Exact mode (reset_pool=0, or small batches): every env computes its own
    fresh reset; done envs take it.

    Pooled mode (reset_pool=R > 0): only R fresh states are sampled per step
    and done envs consume them rank-ordered — at ~200-step episodes a few
    dozen of 4096 envs finish per step, so computing 4096 resets every step
    is almost-all-discarded work. Each pool entry is an iid draw from the
    same reset distribution (fresh PRNG stream), so episode statistics are
    unchanged; if more than R envs finish in one step, entries are reused
    modulo R (documented deviation; R defaults to 256, ~10x the steady-state
    per-step done count).

    Returns (out_state, fresh_pool_or_None, pool_idx_or_None); the pool info
    lets callers render only the (few) fresh states instead of the batch.
    """
    B = done.shape[0]
    keys = jax.vmap(jax.random.split)(next_state.rng)      # (B, 2, 2)
    k_reset, k_carry = keys[:, 0], keys[:, 1]
    next_state = next_state.replace(rng=k_carry)
    pool = cfg.reset_pool
    if pool and pool < B:
        fresh_pool = jax.vmap(
            lambda k: core.reset(cfg, assets, k))(k_reset[:pool])
        rank = jnp.cumsum(done) - 1
        idx = (rank % pool).astype(jnp.int32)
        fresh = jax.tree.map(lambda f: f[idx], fresh_pool)
        # consumed pool entries carry the consuming env's fresh key
        fresh = fresh.replace(rng=k_reset)
        return _select_done(done, fresh, next_state), fresh_pool, idx
    fresh = jax.vmap(lambda k: core.reset(cfg, assets, k))(k_reset)
    return _select_done(done, fresh, next_state), None, None


def _step_autoreset(cfg: EnvConfig, assets: Assets, state, actions,
                    npc_params=None):
    next_state, reward, term, trunc, info = jax.vmap(
        functools.partial(core.step, cfg, assets, npc_params=npc_params))(
        state, actions)
    done = term | trunc
    out_state, _, _ = _autoreset(cfg, assets, next_state, done)
    return out_state, reward, term, trunc, info


def make_env_fns(cfg: EnvConfig, assets: Assets, render: bool = True,
                 with_final_obs: bool = False) -> Tuple[Callable, Callable]:
    """Pure, unjitted batched (reset_fn, step_fn).

    reset_fn(keys[B]) -> (state, obs)
    step_fn(state, actions[B, 2]) -> StepOutput
    Obs rendering can be disabled (`render=False`) for state-based pipelines;
    obs is then a zero-size placeholder.

    `with_final_obs=True` additionally exposes the pre-auto-reset observation
    (`StepOutput.final_obs`) — the true terminal obs for done envs, required
    for SB3-semantics truncation bootstrapping. In pooled-reset mode only the
    pool (R << B states) is rendered a second time; otherwise the full batch
    renders twice.
    """
    reset_one = functools.partial(core.reset, cfg, assets)
    obs_batched = functools.partial(_obs_batched, cfg, assets)
    npc_params = None
    if cfg.npc_mode == "policy":
        from torchdriveenv_tpu.npc.policy_net import default_params
        npc_params = default_params()

    def reset_fn(keys: jnp.ndarray, cases: jnp.ndarray = None):
        """cases: optional (B,) int32 fixed scenario indices (evaluation /
        golden harness; core.reset samples uniformly when None)."""
        if cases is None:
            state = jax.vmap(reset_one)(keys)
        else:
            state = jax.vmap(lambda k, c: core.reset(cfg, assets, k, case=c))(
                keys, cases)
        obs = obs_batched(state) if render else _no_obs(keys.shape[0], cfg)
        return state, obs

    def step_fn(state, actions: jnp.ndarray) -> StepOutput:
        next_state, reward, term, trunc, info = jax.vmap(
            functools.partial(core.step, cfg, assets, npc_params=npc_params))(
            state, actions)
        done = term | trunc
        if not with_final_obs:
            out_state, _, _ = _autoreset(cfg, assets, next_state, done)
            obs = obs_batched(out_state) if render \
                else _no_obs(reward.shape[0], cfg)
            return StepOutput(out_state, obs, reward, term, trunc, info)

        # pre-reset render: the true next/terminal observation
        final_obs = obs_batched(next_state) if render \
            else _no_obs(reward.shape[0], cfg)
        out_state, fresh_pool, idx = _autoreset(cfg, assets, next_state, done)
        if render:
            if fresh_pool is not None:
                pool_obs = obs_batched(fresh_pool)          # (R, 3, res, res)
                obs = jnp.where(done[:, None, None, None],
                                pool_obs[idx], final_obs)
            else:
                obs = jnp.where(done[:, None, None, None],
                                obs_batched(out_state), final_obs)
        else:
            obs = final_obs
        return StepOutput(out_state, obs, reward, term, trunc, info,
                          final_obs=final_obs)

    return reset_fn, step_fn


def _no_obs(batch: int, cfg: EnvConfig) -> jnp.ndarray:
    res = cfg.simulator.renderer.obs_res
    return jnp.zeros((batch, 3, res, res), jnp.uint8)


class BatchedEnv:
    """Convenience wrapper holding jitted reset/step for a fixed batch size."""

    def __init__(self, cfg: EnvConfig, assets: Assets, num_envs: int,
                 render: bool = True):
        self.cfg = cfg
        self.assets = assets
        self.num_envs = num_envs
        reset_fn, step_fn = make_env_fns(cfg, assets, render=render)
        self._reset = jax.jit(reset_fn)
        self._step = jax.jit(step_fn)

    def reset(self, key: jnp.ndarray):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, state, actions: jnp.ndarray) -> StepOutput:
        return self._step(state, actions)
