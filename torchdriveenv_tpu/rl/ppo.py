"""PPO learner (jitted, device-resident) + GAE.

Matches the reference's SB3 PPO baseline (examples/rl_training.py:171-173:
``PPO("CnnPolicy", env, batch_size=256, n_epochs=5, ent_coef=0.01)``) with
SB3 defaults otherwise: lr 3e-4, n_steps 2048 per env, gamma 0.99,
gae_lambda 0.95, clip 0.2, vf_coef 0.5, max_grad_norm 0.5.

The rollout arrives as time-major arrays straight from the jitted
`lax.scan` collector (rollout.py); GAE and the epoch/minibatch loop run
entirely on device (`lax.scan` over shuffled minibatches).
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


@struct.dataclass
class PPOConfig:
    lr: float = 3e-4
    n_steps: int = 2048           # per env (SB3 default)
    batch_size: int = 256         # reference rl_training.py:172
    n_epochs: int = 5             # reference rl_training.py:172
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 0.01        # reference rl_training.py:172
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5


@struct.dataclass
class PPOState:
    params: Any
    opt: Any
    step: jnp.ndarray


def bootstrap_truncated_rewards(reward, terminated, truncated, v_final,
                                gamma):
    """SB3 OnPolicyAlgorithm timeout handling: on a time-limit truncation the
    collected reward is augmented with ``gamma * V(terminal_observation)``
    before GAE (SB3 on_policy_algorithm.collect_rollouts; the reference's PPO
    and A2C baselines inherit this, reference rl_training.py:171-178).
    Real terminations (collision/offroad/light) are NOT bootstrapped — their
    value is genuinely zero. GAE still cuts at done; the bootstrap rides in
    on the reward. In this env success is *defined* as reaching the 200-step
    truncation, so zeroing the value there would bias exactly the
    trajectories the learner must value highest.
    """
    boot = truncated & ~terminated
    return reward + gamma * jnp.where(boot, v_final, 0.0)


def compute_gae(rewards, values, dones, last_value, gamma, lam):
    """Time-major GAE. rewards/values/dones: (T, E); last_value: (E,).

    dones marks episode end AT step t (next state belongs to a new episode);
    both advantage propagation and bootstrap are cut there. Time-limit
    truncations must be pre-bootstrapped into `rewards` via
    `bootstrap_truncated_rewards` (SB3 semantics).
    """
    def scan_fn(carry, inp):
        adv_next, v_next = carry
        r, v, d = inp
        nonterm = 1.0 - d.astype(jnp.float32)
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        scan_fn, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return advs, advs + values


class PPO:
    def __init__(self, cfg: PPOConfig = PPOConfig(), obs_channels: int = 9):
        self.cfg = cfg
        self.net = GaussianActorCritic()
        self.obs_channels = obs_channels
        self.opt = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(cfg.lr, eps=1e-5),
        )

    def init(self, key: jnp.ndarray, obs_res: int = 64) -> PPOState:
        dummy = jnp.zeros((1, self.obs_channels, obs_res, obs_res), jnp.uint8)
        params = self.net.init(key, dummy)
        return PPOState(params=params, opt=self.opt.init(params),
                        step=jnp.zeros((), jnp.int32))

    def select_action(self, state: PPOState, obs: jnp.ndarray,
                      key: jnp.ndarray, deterministic: bool = False):
        """Returns (RAW normalized action sample, log_prob, value).

        SB3 stores the unclipped Gaussian sample in the rollout buffer and
        clips only the copy sent to the env (on_policy_algorithm
        collect_rollouts) — storing the clipped action instead makes the
        recomputed log-prob at update time disagree with the sampled one
        for boundary samples, corrupting the PPO ratio (and exploding
        A2C's unclipped objective). Env-time clipping lives in
        scale_action."""
        mu, log_std, value = self.net.apply(state.params, obs)
        if deterministic:
            return mu, jnp.zeros(mu.shape[:-1]), value
        a = mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
        logp = gaussian_log_prob(mu, log_std, a)
        return a, logp, value

    def value(self, state: PPOState, obs: jnp.ndarray) -> jnp.ndarray:
        _, _, v = self.net.apply(state.params, obs)
        return v

    def update(self, state: PPOState, rollout: Dict[str, jnp.ndarray],
               last_value: jnp.ndarray, key: jnp.ndarray
               ) -> Tuple[PPOState, Dict[str, jnp.ndarray]]:
        """rollout: time-major dict with obs (T,E,C,H,W) uint8, action,
        log_prob, value, reward, done. One full PPO update (epochs x
        minibatches) in-graph."""
        cfg = self.cfg
        advs, returns = compute_gae(rollout["reward"], rollout["value"],
                                    rollout["done"], last_value,
                                    cfg.gamma, cfg.gae_lambda)
        t, e = advs.shape
        flat = {
            "obs": rollout["obs"].reshape((t * e,) + rollout["obs"].shape[2:]),
            "action": rollout["action"].reshape(t * e, -1),
            "log_prob": rollout["log_prob"].reshape(t * e),
            "adv": advs.reshape(t * e),
            "ret": returns.reshape(t * e),
        }
        n = t * e
        n_mb = max(n // cfg.batch_size, 1)

        def epoch_fn(carry, ep_key):
            params, opt_state = carry
            perm = jax.random.permutation(ep_key, n)

            def mb_fn(carry, mb_idx):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(
                    perm, mb_idx * cfg.batch_size, cfg.batch_size)
                mb = {k: v[idx] for k, v in flat.items()}

                def loss_fn(p):
                    mu, log_std, value = self.net.apply(p, mb["obs"])
                    logp = gaussian_log_prob(mu, log_std, mb["action"])
                    ratio = jnp.exp(logp - mb["log_prob"])
                    adv = mb["adv"]
                    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
                    unclipped = ratio * adv
                    clipped = jnp.clip(ratio, 1 - cfg.clip_range,
                                       1 + cfg.clip_range) * adv
                    pg_loss = -jnp.minimum(unclipped, clipped).mean()
                    v_loss = ((value - mb["ret"]) ** 2).mean()
                    ent = gaussian_entropy(log_std).mean()
                    loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
                    return loss, (pg_loss, v_loss, ent)

                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = self.opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss,) + aux

            (params, opt_state), metrics = jax.lax.scan(
                mb_fn, (params, opt_state), jnp.arange(n_mb))
            return (params, opt_state), metrics

        keys = jax.random.split(key, cfg.n_epochs)
        (params, opt_state), metrics = jax.lax.scan(
            epoch_fn, (state.params, state.opt), keys)
        loss, pg, vl, ent = (m.mean() for m in metrics)
        new_state = state.replace(params=params, opt=opt_state,
                                  step=state.step + 1)
        return new_state, dict(loss=loss, pg_loss=pg, v_loss=vl, entropy=ent)
