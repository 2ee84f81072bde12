"""Evaluation harness: the reference's 9-metric benchmark suite, on device.

Computes exactly the metric set the reference's ``EvalNTimestepsCallback``
records (reference examples/rl_training.py:39-108):
  mean_episode_reward, mean_episode_length, offroad_rate, collision_rate,
  traffic_light_violation_rate, success_percentage, reached_waypoint_num
  (mean over episodes), psi_smoothness, speed_smoothness (per-episode means).

One episode per env, run in lockstep to the 200-step horizon inside a single
`lax.scan`; per-env accumulators freeze at that env's first episode end
(the reference evaluates one episode at a time through SB3's
evaluate_policy — here "n episodes" is just the env batch size).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.rl.rollout import init_stack, update_stack


def make_evaluator(reset_fn, step_fn, policy: Callable,
                   frame_stack: int, scale_action: Callable,
                   max_steps: int = 200, cases=None, n_cases: int = None):
    """policy(policy_state, obs_stack) -> normalized deterministic action
    (E, A); `policy_state` (params etc.) is threaded through evaluate so the
    jitted evaluator never captures stale parameters.

    `cases`: optional per-episode fixed scenario indices (len == n episodes)
    with `n_cases` the static suite size. When given, episodes start on
    those exact cases and the metric dict additionally carries
    ``success_case_{i}`` / ``reached_case_{i}`` per case — without this a
    0% aggregate cannot say WHICH of the reference's five named validation
    cases (reference README.md:15-27) fails.

    Returns evaluate(keys, policy_state) computing the metric dict; jit the
    returned callable (n_episodes = len(keys) = env batch of the reset_fn).
    """
    if cases is not None:
        cases = jnp.asarray(cases, jnp.int32)

    def evaluate(keys: jnp.ndarray, policy_state) -> Dict[str, jnp.ndarray]:
        env_state, obs = reset_fn(keys) if cases is None \
            else reset_fn(keys, cases)
        e = obs.shape[0]
        stack = init_stack(obs, frame_stack)

        acc = dict(
            alive=jnp.ones((e,), bool),
            reward=jnp.zeros((e,)),
            length=jnp.zeros((e,), jnp.int32),
            offroad=jnp.zeros((e,), bool),
            collision=jnp.zeros((e,), bool),
            light=jnp.zeros((e,), bool),
            success=jnp.zeros((e,), bool),
            reached=jnp.zeros((e,), jnp.int32),
            psi_sm_sum=jnp.zeros((e,)),
            speed_sm_sum=jnp.zeros((e,)),
        )

        def one(carry, _):
            env_state, stack, acc = carry
            a = policy(policy_state, stack)
            out = step_fn(env_state, scale_action(a))
            done = out.terminated | out.truncated
            alive = acc["alive"]
            info = out.info
            acc = dict(
                alive=alive & ~done,
                reward=acc["reward"] + jnp.where(alive, out.reward, 0.0),
                length=acc["length"] + alive.astype(jnp.int32),
                offroad=acc["offroad"] | (alive & (info["offroad"] > 0)),
                collision=acc["collision"] | (alive & (info["collision"] > 0)),
                light=acc["light"]
                | (alive & (info["traffic_light_violation"] > 0)),
                success=acc["success"] | (alive & info["is_success"]),
                reached=jnp.where(alive, info["reached_waypoint_num"],
                                  acc["reached"]),
                psi_sm_sum=acc["psi_sm_sum"]
                + jnp.where(alive, info["psi_smoothness"], 0.0),
                speed_sm_sum=acc["speed_sm_sum"]
                + jnp.where(alive, info["speed_smoothness"], 0.0),
            )
            stack = update_stack(stack, out.obs, done)
            return (out.state, stack, acc), None

        (_, _, acc), _ = jax.lax.scan(
            one, (env_state, stack, acc), None, length=max_steps)

        length = jnp.maximum(acc["length"].astype(jnp.float32), 1.0)
        metrics = dict(
            mean_episode_reward=acc["reward"].mean(),
            mean_episode_length=length.mean(),
            offroad_rate=acc["offroad"].mean(),
            collision_rate=acc["collision"].mean(),
            traffic_light_violation_rate=acc["light"].mean(),
            success_percentage=acc["success"].mean(),
            reached_waypoint_num=acc["reached"].astype(jnp.float32).mean(),
            psi_smoothness=(acc["psi_sm_sum"] / length).mean(),
            speed_smoothness=(acc["speed_sm_sum"] / length).mean(),
        )
        if cases is not None:
            onehot = jax.nn.one_hot(cases, n_cases)          # (E, C)
            n_per = jnp.maximum(onehot.sum(0), 1.0)          # episodes/case
            succ = (onehot * acc["success"][:, None].astype(
                jnp.float32)).sum(0) / n_per
            reach = (onehot * acc["reached"][:, None].astype(
                jnp.float32)).sum(0) / n_per
            for i in range(n_cases):
                metrics[f"success_case_{i}"] = succ[i]
                metrics[f"reached_case_{i}"] = reach[i]
        return metrics

    return evaluate
