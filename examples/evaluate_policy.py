#!/usr/bin/env python
"""Policy evaluation example — the reference's
`examples/waypoint_suite_evaluation.ipynb` as a script: load a training
checkpoint and roll deterministic episodes on the 5 validation scenarios,
reporting the paper's 9-metric benchmark set
(reference examples/rl_training.py:99-108).

Usage:
    python examples/evaluate_policy.py --checkpoint models/<run>/step_<N> \
        [--algorithm sac] [--episodes 10]
"""

import argparse

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.config import BaselineAlgorithm, EnvConfig
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.models.policies import scale_action
from torchdriveenv_tpu.parallel.train_step import make_offpolicy_train_fns
from torchdriveenv_tpu.rl.evaluate import make_evaluator
from torchdriveenv_tpu.rl.train import build_agent, restore_checkpoint


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--algorithm", default="sac")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--suite", default="val")
    args = ap.parse_args()

    env_cfg = EnvConfig()
    assets = load_assets(args.suite)
    agent, _ = build_agent(BaselineAlgorithm(args.algorithm),
                           obs_channels=3 * env_cfg.frame_stack)

    # restore the full train state (carry) saved by rl/train.py
    init_fn, _ = make_offpolicy_train_fns(env_cfg, agent, num_envs=2,
                                          buffer_capacity=256,
                                          steps_per_iter=1, updates_per_iter=1)
    carry_like = jax.jit(init_fn)(assets, jax.random.PRNGKey(0))
    carry = restore_checkpoint(args.checkpoint, carry_like)

    reset_fn, step_fn = make_env_fns(env_cfg, assets, render=True)

    def policy(agent_state, stack):
        out = agent.select_action(agent_state, stack, jax.random.PRNGKey(0),
                                  deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    ev = make_evaluator(reset_fn, step_fn, policy, env_cfg.frame_stack,
                        scale_action, max_steps=env_cfg.max_environment_steps)
    keys = jax.random.split(jax.random.PRNGKey(123), args.episodes)
    metrics = jax.jit(lambda k, a: ev(k, a))(keys, carry.agent_state)
    for k, v in sorted(metrics.items()):
        print(f"eval/{k}: {float(jnp.asarray(v)):.4f}")


if __name__ == "__main__":
    main()
