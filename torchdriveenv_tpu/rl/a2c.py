"""A2C learner (jitted, device-resident).

Matches the reference's SB3 A2C baseline (examples/rl_training.py:176-179:
``A2C("CnnPolicy", env, policy_kwargs={'optimizer_class': Adam},
n_steps=256 // n_envs, gae_lambda=0.95, ent_coef=0.01)``) with SB3 defaults
otherwise: lr 7e-4, gamma 0.99, vf_coef 0.5, max_grad_norm 0.5, no advantage
normalization, single pass over the whole rollout (no minibatching, no
clipping). The reference overrides SB3's default RMSpropTFLike with Adam.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torchdriveenv_tpu.models.policies import (
    GaussianActorCritic,
    gaussian_entropy,
    gaussian_log_prob,
)
from torchdriveenv_tpu.rl.ppo import compute_gae


@struct.dataclass
class A2CConfig:
    lr: float = 7e-4
    n_steps: int = 26             # reference: 256 // n_envs with n_envs=10
    gamma: float = 0.99
    gae_lambda: float = 0.95      # reference rl_training.py:178
    ent_coef: float = 0.01        # reference rl_training.py:178
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5


@struct.dataclass
class A2CState:
    params: Any
    opt: Any
    step: jnp.ndarray


class A2C:
    def __init__(self, cfg: A2CConfig = A2CConfig(), obs_channels: int = 9):
        self.cfg = cfg
        self.net = GaussianActorCritic()
        self.obs_channels = obs_channels
        # reference passes optimizer_class=torch.optim.Adam
        # (rl_training.py:178), overriding SB3's default RMSpropTFLike
        self.opt = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr),
        )

    def init(self, key: jnp.ndarray, obs_res: int = 64) -> A2CState:
        dummy = jnp.zeros((1, self.obs_channels, obs_res, obs_res), jnp.uint8)
        params = self.net.init(key, dummy)
        return A2CState(params=params, opt=self.opt.init(params),
                        step=jnp.zeros((), jnp.int32))

    def select_action(self, state: A2CState, obs: jnp.ndarray,
                      key: jnp.ndarray, deterministic: bool = False):
        """Raw (unclipped) sample, matching SB3's rollout storage — see
        ppo.PPO.select_action. Env-time clipping lives in scale_action."""
        mu, log_std, value = self.net.apply(state.params, obs)
        if deterministic:
            return mu, jnp.zeros(mu.shape[:-1]), value
        a = mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
        logp = gaussian_log_prob(mu, log_std, a)
        return a, logp, value

    def value(self, state: A2CState, obs: jnp.ndarray) -> jnp.ndarray:
        _, _, v = self.net.apply(state.params, obs)
        return v

    def update(self, state: A2CState, rollout: Dict[str, jnp.ndarray],
               last_value: jnp.ndarray, key: jnp.ndarray
               ) -> Tuple[A2CState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        del key
        advs, returns = compute_gae(rollout["reward"], rollout["value"],
                                    rollout["done"], last_value,
                                    cfg.gamma, cfg.gae_lambda)
        t, e = advs.shape
        obs = rollout["obs"].reshape((t * e,) + rollout["obs"].shape[2:])
        action = rollout["action"].reshape(t * e, -1)
        adv = jax.lax.stop_gradient(advs.reshape(t * e))
        ret = jax.lax.stop_gradient(returns.reshape(t * e))

        def loss_fn(p):
            mu, log_std, value = self.net.apply(p, obs)
            logp = gaussian_log_prob(mu, log_std, action)
            pg_loss = -(adv * logp).mean()
            v_loss = ((value - ret) ** 2).mean()
            ent = gaussian_entropy(log_std).mean()
            return (pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent,
                    (pg_loss, v_loss, ent))

        (loss, (pg, vl, ent)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.opt.update(grads, state.opt, state.params)
        new_state = state.replace(
            params=optax.apply_updates(state.params, updates),
            opt=opt_state, step=state.step + 1)
        return new_state, dict(loss=loss, pg_loss=pg, v_loss=vl, entropy=ent)
