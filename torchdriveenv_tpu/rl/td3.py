"""TD3 learner (jitted, device-resident).

Matches the reference's SB3 TD3 baseline (examples/rl_training.py:181-183:
``TD3("CnnPolicy", env, train_freq=1, buffer_size=100000)``) with SB3
defaults: lr 1e-3, gamma 0.99, tau 0.005, batch 256, policy delay 2,
target policy noise 0.2 clipped at 0.5, exploration noise 0.1.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torchdriveenv_tpu.models.policies import DeterministicActor, DoubleQCritic


@struct.dataclass
class TD3Config:
    lr: float = 1e-3
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    buffer_size: int = 100_000
    learning_starts: int = 100
    policy_delay: int = 2
    target_noise: float = 0.2
    noise_clip: float = 0.5
    explore_noise: float = 0.1


@struct.dataclass
class TD3State:
    actor_params: Any
    target_actor_params: Any
    critic_params: Any
    target_critic_params: Any
    actor_opt: Any
    critic_opt: Any
    step: jnp.ndarray


class TD3:
    def __init__(self, cfg: TD3Config = TD3Config(), obs_channels: int = 9):
        self.cfg = cfg
        self.actor = DeterministicActor()
        self.critic = DoubleQCritic()
        self.obs_channels = obs_channels
        self.opt = optax.adam(cfg.lr)

    def init(self, key: jnp.ndarray, obs_res: int = 64) -> TD3State:
        k1, k2 = jax.random.split(key)
        dummy_obs = jnp.zeros((1, self.obs_channels, obs_res, obs_res), jnp.uint8)
        dummy_act = jnp.zeros((1, 2))
        actor_params = self.actor.init(k1, dummy_obs)
        critic_params = self.critic.init(k2, dummy_obs, dummy_act)
        return TD3State(
            actor_params=actor_params, target_actor_params=actor_params,
            critic_params=critic_params, target_critic_params=critic_params,
            actor_opt=self.opt.init(actor_params),
            critic_opt=self.opt.init(critic_params),
            step=jnp.zeros((), jnp.int32),
        )

    def select_action(self, state: TD3State, obs: jnp.ndarray,
                      key: jnp.ndarray, deterministic: bool = False
                      ) -> jnp.ndarray:
        a = self.actor.apply(state.actor_params, obs)
        if deterministic:
            return a
        noise = self.cfg.explore_noise * jax.random.normal(key, a.shape)
        return jnp.clip(a + noise, -1.0, 1.0)

    def update(self, state: TD3State, batch: Dict[str, jnp.ndarray],
               key: jnp.ndarray) -> Tuple[TD3State, Dict[str, jnp.ndarray]]:
        cfg = self.cfg

        # --- smoothed target action
        noise = jnp.clip(cfg.target_noise * jax.random.normal(
            key, batch["action"].shape), -cfg.noise_clip, cfg.noise_clip)
        next_a = jnp.clip(
            self.actor.apply(state.target_actor_params, batch["next_obs"])
            + noise, -1.0, 1.0)
        tq1, tq2 = self.critic.apply(state.target_critic_params,
                                     batch["next_obs"], next_a)
        target_q = batch["reward"] + cfg.gamma * batch["discount_mask"] \
            * jnp.minimum(tq1, tq2)
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply(params, batch["obs"], batch["action"])
            return ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean(), q1.mean()

        (critic_loss, q1m), critic_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.critic_params)
        c_up, critic_opt = self.opt.update(critic_grads, state.critic_opt)
        new_critic = optax.apply_updates(state.critic_params, c_up)

        # --- delayed policy + target update (lax.cond keeps it in-graph)
        def do_actor(_):
            def actor_loss_fn(params):
                a = self.actor.apply(params, batch["obs"])
                q1, _ = self.critic.apply(new_critic, batch["obs"], a)
                return -q1.mean()

            actor_loss, actor_grads = jax.value_and_grad(actor_loss_fn)(
                state.actor_params)
            a_up, actor_opt = self.opt.update(actor_grads, state.actor_opt)
            new_actor = optax.apply_updates(state.actor_params, a_up)
            new_t_actor = jax.tree.map(
                lambda t, o: t * (1 - cfg.tau) + o * cfg.tau,
                state.target_actor_params, new_actor)
            new_t_critic = jax.tree.map(
                lambda t, o: t * (1 - cfg.tau) + o * cfg.tau,
                state.target_critic_params, new_critic)
            return new_actor, new_t_actor, new_t_critic, actor_opt, actor_loss

        def skip_actor(_):
            return (state.actor_params, state.target_actor_params,
                    state.target_critic_params, state.actor_opt,
                    jnp.zeros(()))

        (new_actor, new_t_actor, new_t_critic, actor_opt, actor_loss
         ) = jax.lax.cond(state.step % cfg.policy_delay == 0,
                          do_actor, skip_actor, operand=None)

        new_state = state.replace(
            actor_params=new_actor, target_actor_params=new_t_actor,
            critic_params=new_critic, target_critic_params=new_t_critic,
            actor_opt=actor_opt, critic_opt=critic_opt,
            step=state.step + 1,
        )
        return new_state, dict(critic_loss=critic_loss,
                               actor_loss=actor_loss, q1=q1m)
