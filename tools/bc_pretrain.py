#!/usr/bin/env python
"""Behavior-cloning pretrain: fit the SAC actor to the scripted
demonstration driver (rl/demo.py), producing a model-only init checkpoint
for `--init_model`.

Rolls the scripted driver through the real env (rendered observations),
collects (frame-stack, normalized action) pairs, and supervised-trains the
actor head: mse(tanh(mu), a_demo) + a small log_std pull toward
BC_LOG_STD. The critic/opt states stay fresh; log_alpha starts low
(--init_alpha) so early SAC entropy pressure doesn't blast the cloned
policy apart before the critic warms up.

Motivation (TRAINING.md r5): the env's reward optimum at SB3 defaults is
fast-but-fatal waypoint chasing (measured: the 67%-success scripted driver
collects ~300 episode reward vs the learned policy's ~400) — pure SAC
converges away from the success metric. Cloning first puts the policy in
the surviving basin; SAC then improves reward from there.

Usage:
    python tools/bc_pretrain.py --out artifacts/bc_init [--envs 64]
        [--rollout_steps 600] [--bc_steps 2000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

BC_LOG_STD = -1.6       # exp(-1.6) ~ 0.2: tight but not collapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--rollout_steps", type=int, default=600)
    ap.add_argument("--bc_steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--init_alpha", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/bc_init")
    args = ap.parse_args()

    import optax

    from torchdriveenv_tpu.config import EnvConfig
    from torchdriveenv_tpu.env.batched import make_env_fns
    from torchdriveenv_tpu.maps.arrays import load_assets
    from torchdriveenv_tpu.models.policies import unscale_action
    from torchdriveenv_tpu.rl.demo import make_scripted_driver
    from torchdriveenv_tpu.rl.rollout import init_stack, update_stack
    from torchdriveenv_tpu.rl.sac import SAC, SACConfig

    cfg = EnvConfig()
    assets = load_assets("train")
    fs = cfg.frame_stack
    reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    drv = make_scripted_driver(cfg, assets)

    def collect(key):
        state, obs = reset_fn(jax.random.split(key, args.envs))
        stack = init_stack(obs, fs)

        def one(c, _):
            state, stack = c
            a = drv(state)
            out = step_fn(state, a)
            pair = (stack, unscale_action(a))
            stack = update_stack(stack, out.obs,
                                 out.terminated | out.truncated)
            return (out.state, stack), pair
        _, (stacks, acts) = jax.lax.scan(
            one, (state, stack), None, length=args.rollout_steps)
        return (stacks.reshape((-1,) + stacks.shape[2:]),
                acts.reshape((-1, 2)))

    print(f"collecting {args.rollout_steps * args.envs} demo pairs...",
          file=sys.stderr, flush=True)
    stacks, acts = jax.jit(collect)(jax.random.PRNGKey(args.seed))
    stacks, acts = jax.block_until_ready((stacks, acts))
    n = stacks.shape[0]
    print(f"collected {n} pairs", file=sys.stderr, flush=True)

    agent = SAC(SACConfig(init_alpha=args.init_alpha), obs_channels=3 * fs)
    state = agent.init(jax.random.PRNGKey(args.seed + 1),
                       obs_res=cfg.simulator.renderer.obs_res)
    opt = optax.adam(args.lr)

    def bc_loss(params, obs, a):
        mu, log_std = agent.actor.apply(params, obs)
        # clip targets inside the open interval: the demo driver saturates
        # accel at exactly +-1 and mse(tanh(mu), +-1) drives mu -> inf
        a = jnp.clip(a, -0.98, 0.98)
        act_mse = ((jnp.tanh(mu) - a) ** 2).mean()
        std_pull = ((log_std - BC_LOG_STD) ** 2).mean()
        return act_mse + 0.05 * std_pull, act_mse

    def bc_phase(actor_params, stacks, acts, key):
        # dataset arrives as ARGUMENTS — closing over it would inline the
        # multi-GB array as a compile-time constant
        opt_state = opt.init(actor_params)

        def one(c, k):
            params, opt_state = c
            idx = jax.random.randint(k, (args.batch,), 0, n)
            (_, mse), g = jax.value_and_grad(bc_loss, has_aux=True)(
                params, stacks[idx], acts[idx])
            up, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, up), opt_state), mse
        keys = jax.random.split(key, args.bc_steps)
        (params, _), mses = jax.lax.scan(one, (actor_params, opt_state), keys)
        return params, mses

    actor_params, mses = jax.jit(bc_phase)(
        state.actor_params, stacks, acts, jax.random.PRNGKey(args.seed + 2))
    mses = np.asarray(mses)
    print(f"BC {args.bc_steps} steps: action-MSE {mses[0]:.4f} -> "
          f"{mses[-100:].mean():.4f}", file=sys.stderr, flush=True)

    state = state.replace(actor_params=actor_params,
                          actor_opt=agent.opt.init(actor_params))

    from torchdriveenv_tpu.rl.train import save_model
    out_dir, name = os.path.split(os.path.abspath(args.out))
    # save_model writes <dir>/model_<step>; emulate its layout directly
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.out),
                                  jax.device_get(state), force=True)
    print(f"-> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
