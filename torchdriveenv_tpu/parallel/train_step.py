"""Fused, mesh-sharded training steps (rollout + learner in one XLA program).

An Anakin-style design: env stepping and learner updates compile into the
same jitted program; the env batch axis is sharded over the mesh's ``env``
axis while params stay replicated, so GSPMD inserts the gradient all-reduce
(`psum` over ICI) automatically. This is the TPU-native replacement for the
reference's SubprocVecEnv worker pool + single-GPU SB3 learner
(reference examples/rl_training.py:159-216).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import Assets
from torchdriveenv_tpu.models.policies import scale_action
from torchdriveenv_tpu.rl import buffer as replay
from torchdriveenv_tpu.rl.rollout import RolloutState, init_stack, update_stack


@struct.dataclass
class OffPolicyCarry:
    rollout: RolloutState
    buffer: replay.ReplayBuffer
    agent_state: Any
    key: jnp.ndarray
    env_steps: jnp.ndarray     # () int64-ish total env steps taken


def make_offpolicy_train_fns(env_cfg: EnvConfig, agent, num_envs: int,
                             buffer_capacity: int = 10_000,
                             steps_per_iter: int = 1,
                             updates_per_iter: int = 1,
                             mesh=None,
                             demo_fn=None, demo_steps: int = 0,
                             demo_envs: int = 0):
    """Build (init_fn, train_step_fn) for SAC/TD3.

    init_fn(assets, key) -> OffPolicyCarry
    train_step_fn(assets, carry) -> (carry, metrics)

    Each train step: `steps_per_iter` lockstep env steps appended to the
    replay buffer, then `updates_per_iter` gradient updates on sampled
    batches. Jit with `assets` as an argument (donate `carry`).
    When `mesh` is given the caller is expected to have placed carry leaves
    with the env axis sharded (parallel.mesh.shard_batch) — annotations
    propagate from inputs.

    SB3 warmup semantics (`learning_starts`, sb3 off_policy_algorithm):
    while total env steps < learning_starts, actions are drawn uniformly
    from the action space and no gradient updates run.

    `demo_fn` (optional): scripted state-based driver (rl/demo.py); while
    total env steps < `demo_steps`, actions come from it instead of the
    policy, seeding the buffer with demonstration transitions (gradient
    updates still start at learning_starts — off-policy SAC learns from the
    demo data as it streams in). `demo_envs` additionally keeps the FIRST
    K envs scripted for the whole run (persistent expert envs: a steady
    stream of horizon-reaching trajectories in the buffer).
    """
    fs = env_cfg.frame_stack
    res = env_cfg.simulator.renderer.obs_res

    def init_fn(assets: Assets, key: jnp.ndarray) -> OffPolicyCarry:
        k_env, k_agent, k_carry = jax.random.split(key, 3)
        reset_fn, _ = make_env_fns(env_cfg, assets, render=True)
        env_state, obs = reset_fn(jax.random.split(k_env, num_envs))
        stack = init_stack(obs, fs)
        buf = replay.create(num_envs, buffer_capacity, (3, res, res))
        agent_state = agent.init(k_agent, obs_res=res)
        return OffPolicyCarry(
            rollout=RolloutState(env_state, stack, k_carry),
            buffer=buf, agent_state=agent_state,
            key=k_carry, env_steps=jnp.zeros((), jnp.int32))

    def train_step_fn(assets: Assets, carry: OffPolicyCarry
                      ) -> Tuple[OffPolicyCarry, dict]:
        _, step_fn = make_env_fns(env_cfg, assets, render=True,
                                  with_final_obs=True)
        warmup = carry.env_steps < agent.cfg.learning_starts

        def env_step(subcarry, _):
            rs, buf = subcarry
            k_act, k_rand, k_next = jax.random.split(rs.key, 3)
            a_pi = agent.select_action(carry.agent_state, rs.obs_stack, k_act)
            a_rand = jax.random.uniform(k_rand, a_pi.shape,
                                        minval=-1.0, maxval=1.0)
            a = jnp.where(warmup, a_rand, a_pi)
            if demo_fn is not None:
                from torchdriveenv_tpu.models.policies import unscale_action
                demo_phase = carry.env_steps < demo_steps
                demo_mask = demo_phase | (
                    jnp.arange(a.shape[0]) < demo_envs)
                a_demo = jnp.clip(unscale_action(demo_fn(rs.env_state)),
                                  -1.0, 1.0)
                a = jnp.where(demo_mask[:, None], a_demo, a)
            out = step_fn(rs.env_state, scale_action(a))
            done = out.terminated | out.truncated
            cur_frame = rs.obs_stack[:, -3:]
            dm = None
            if demo_fn is not None:
                dm = demo_mask
            buf = replay.add(buf, cur_frame, a, out.reward, done,
                             out.terminated, out.final_obs, demo_mask=dm)
            stack = update_stack(rs.obs_stack, out.obs, done)
            return (RolloutState(out.state, stack, k_next), buf), out.reward

        (rs, buf), rewards = jax.lax.scan(
            env_step, (carry.rollout, carry.buffer), None,
            length=steps_per_iter)

        def learn(subcarry, k):
            agent_state = subcarry
            k_samp, k_up = jax.random.split(k)
            batch = replay.sample(buf, k_samp, agent.cfg.batch_size, fs)
            agent_state, m = agent.update(agent_state, batch, k_up)
            return agent_state, m

        k_learn, k_next = jax.random.split(carry.key)
        learn_keys = jax.random.split(k_learn, updates_per_iter)

        def do_learn(agent_state):
            return jax.lax.scan(learn, agent_state, learn_keys)

        def skip_learn(agent_state):
            shapes = jax.eval_shape(do_learn, agent_state)
            return agent_state, jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes[1])

        agent_state, metrics = jax.lax.cond(
            warmup, skip_learn, do_learn, carry.agent_state)

        new_carry = OffPolicyCarry(
            rollout=rs, buffer=buf, agent_state=agent_state, key=k_next,
            env_steps=carry.env_steps + steps_per_iter * num_envs)
        out_metrics = {k: v.mean() for k, v in metrics.items()}
        out_metrics["mean_step_reward"] = rewards.mean()
        return new_carry, out_metrics

    return init_fn, train_step_fn


def make_onpolicy_train_fns(env_cfg: EnvConfig, agent, num_envs: int,
                            n_steps: Optional[int] = None):
    """Build (init_fn, train_step_fn) for PPO/A2C.

    Each train step: collect `n_steps` per env via `lax.scan`, then the
    agent's full update (epochs/minibatches in-graph).
    """
    fs = env_cfg.frame_stack
    n_steps = n_steps or agent.cfg.n_steps

    @struct.dataclass
    class OnPolicyCarry:
        rollout: RolloutState
        agent_state: Any
        key: jnp.ndarray
        env_steps: jnp.ndarray

    def init_fn(assets: Assets, key: jnp.ndarray):
        k_env, k_agent, k_carry = jax.random.split(key, 3)
        reset_fn, _ = make_env_fns(env_cfg, assets, render=True)
        env_state, obs = reset_fn(jax.random.split(k_env, num_envs))
        stack = init_stack(obs, fs)
        agent_state = agent.init(
            k_agent, obs_res=env_cfg.simulator.renderer.obs_res)
        return OnPolicyCarry(RolloutState(env_state, stack, k_carry),
                             agent_state, k_carry,
                             jnp.zeros((), jnp.int32))

    def train_step_fn(assets: Assets, carry):
        # with_final_obs: the pre-auto-reset terminal observation, needed for
        # SB3 timeout bootstrapping (bootstrap_truncated_rewards below)
        _, step_fn = make_env_fns(env_cfg, assets, render=True,
                                  with_final_obs=True)

        def one(rs, _):
            from torchdriveenv_tpu.rl.ppo import bootstrap_truncated_rewards
            k_act, k_next = jax.random.split(rs.key)
            a, logp, value = agent.select_action(
                carry.agent_state, rs.obs_stack, k_act)
            out = step_fn(rs.env_state, scale_action(a))
            done = out.terminated | out.truncated
            # terminal frame stack: shift in final_obs WITHOUT the episode-
            # boundary refill (it belongs to the ending episode)
            c = out.final_obs.shape[1]
            final_stack = jnp.concatenate(
                [rs.obs_stack[:, c:], out.final_obs], axis=1)
            v_final = agent.value(carry.agent_state, final_stack)
            reward = bootstrap_truncated_rewards(
                out.reward, out.terminated, out.truncated, v_final,
                agent.cfg.gamma)
            data = dict(obs=rs.obs_stack, action=a, log_prob=logp,
                        value=value, reward=reward, done=done,
                        raw_reward=out.reward)
            stack = update_stack(rs.obs_stack, out.obs, done)
            return RolloutState(out.state, stack, k_next), data

        rs, rollout = jax.lax.scan(one, carry.rollout, None, length=n_steps)
        last_value = agent.value(carry.agent_state, rs.obs_stack)
        k_up, k_next = jax.random.split(carry.key)
        agent_state, metrics = agent.update(
            carry.agent_state, rollout, last_value, k_up)
        metrics["mean_step_reward"] = rollout["raw_reward"].mean()
        new_carry = OnPolicyCarry(rs, agent_state, k_next,
                                  carry.env_steps + n_steps * num_envs)
        return new_carry, metrics

    return init_fn, train_step_fn
