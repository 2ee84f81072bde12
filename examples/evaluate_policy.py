#!/usr/bin/env python
"""Policy evaluation example — the reference's
`examples/waypoint_suite_evaluation.ipynb` as a script: load a training
checkpoint and roll deterministic episodes on the 5 validation scenarios,
reporting the paper's 9-metric benchmark set
(reference examples/rl_training.py:99-108).

Accepts either a model-only save (`models/<run>/model_<N>`, the frequent
artifact rl/train.py writes at model_save_freq — the analogue of the
reference's wandb model.zip) or a full-carry checkpoint
(`.../full_latest`, pass --full_checkpoint).

Usage:
    python examples/evaluate_policy.py --checkpoint models/<run>/model_<N> \
        [--algorithm sac] [--episodes 10]
"""

import argparse
import os
import sys

# standalone execution without pip-install: repo root on sys.path
# (same bootstrap as tools/golden_trajectories.py:28-29)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.config import BaselineAlgorithm, EnvConfig
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.models.policies import scale_action
from torchdriveenv_tpu.rl.evaluate import make_evaluator
from torchdriveenv_tpu.rl.train import build_agent, restore_checkpoint


def load_agent_state(checkpoint: str, agent, env_cfg: EnvConfig,
                     full_checkpoint: bool = False, assets=None):
    """Restore policy params from a model-only save (default) or pull
    `.agent_state` out of a full-carry checkpoint."""
    if full_checkpoint:
        from torchdriveenv_tpu.parallel.train_step import (
            make_offpolicy_train_fns,
        )
        init_fn, _ = make_offpolicy_train_fns(
            env_cfg, agent, num_envs=2, buffer_capacity=256,
            steps_per_iter=1, updates_per_iter=1)
        carry_like = jax.jit(init_fn)(assets, jax.random.PRNGKey(0))
        return restore_checkpoint(checkpoint, carry_like).agent_state
    state_like = agent.init(jax.random.PRNGKey(0),
                            obs_res=env_cfg.simulator.renderer.obs_res)
    return restore_checkpoint(checkpoint, state_like)


def evaluate(checkpoint: str, algorithm: str = "sac", episodes: int = 10,
             suite: str = "val", env_cfg: EnvConfig = None,
             full_checkpoint: bool = False):
    env_cfg = env_cfg or EnvConfig()
    assets = load_assets(suite)
    agent, _ = build_agent(BaselineAlgorithm(algorithm),
                           obs_channels=3 * env_cfg.frame_stack)
    agent_state = load_agent_state(checkpoint, agent, env_cfg,
                                   full_checkpoint, assets)

    reset_fn, step_fn = make_env_fns(env_cfg, assets, render=True)

    def policy(agent_state, stack):
        out = agent.select_action(agent_state, stack, jax.random.PRNGKey(0),
                                  deterministic=True)
        return out[0] if isinstance(out, tuple) else out

    # validation episodes are pinned round-robin to the 5 named cases so the
    # report carries success_case_{i} (reference README.md:15-27 granularity)
    cases = n_cases = None
    if suite == "val":
        import numpy as np
        n_cases = int(assets.suite.case_town.shape[0])
        episodes = max(episodes, n_cases)
        cases = np.arange(episodes) % n_cases
    ev = make_evaluator(reset_fn, step_fn, policy, env_cfg.frame_stack,
                        scale_action, max_steps=env_cfg.max_environment_steps,
                        cases=cases, n_cases=n_cases)
    keys = jax.random.split(jax.random.PRNGKey(123), episodes)
    metrics = jax.jit(ev)(keys, agent_state)
    return {k: float(jnp.asarray(v)) for k, v in metrics.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--algorithm", default="sac")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--suite", default="val")
    ap.add_argument("--full_checkpoint", action="store_true")
    ap.add_argument("--npc_mode", default=None, choices=["route", "policy"],
                    help="override the NPC behavioral model (deterministic "
                    "IDM route-follower vs the distilled GRU policy, the "
                    "trainable IAI-DRIVE stand-in)")
    args = ap.parse_args()

    env_cfg = None
    if args.npc_mode:
        env_cfg = EnvConfig(npc_mode=args.npc_mode)
    metrics = evaluate(args.checkpoint, args.algorithm, args.episodes,
                       args.suite, env_cfg=env_cfg,
                       full_checkpoint=args.full_checkpoint)
    for k, v in sorted(metrics.items()):
        print(f"eval/{k}: {v:.4f}")


if __name__ == "__main__":
    main()
