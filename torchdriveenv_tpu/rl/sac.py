"""SAC learner (jitted, device-resident).

Matches the reference's SB3 SAC baseline (examples/rl_training.py:166-168:
``SAC("CnnPolicy", env, buffer_size=100000)``) with SB3-default
hyperparameters: lr 3e-4, gamma 0.99, tau 0.005, batch 256, auto entropy
tuning with target entropy = -action_dim.

Everything is a pure function over an `SACState` pytree so the whole
update (actor + twin critics + temperature + target polyak) is one XLA
program; under data-parallel training, gradients are `psum`-ed over the mesh
by the caller (parallel/learner.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from torchdriveenv_tpu.models.policies import (
    DoubleQCritic,
    SquashedGaussianActor,
    sample_squashed,
)


@struct.dataclass
class SACConfig:
    lr: float = 3e-4
    gamma: float = 0.99
    tau: float = 0.005
    batch_size: int = 256
    # SB3 default is 1e6 transitions; we keep 1e5 so single frames
    # (E*N, 3, 64, 64) stay comfortably inside one chip's HBM alongside the
    # envs and learner (documented deviation; the reference keeps the buffer
    # in host RAM).
    buffer_size: int = 100_000
    learning_starts: int = 100      # SB3 default (sb3 off_policy_algorithm)
    target_entropy: float = -2.0    # -action_dim (SB3 "auto")
    init_alpha: float = 1.0
    # critic warmup for warm-started actors (BC/fine-tune): actor and
    # temperature updates are APPLIED only from this gradient step on —
    # a fresh critic's early gradients would otherwise walk a cloned
    # policy out of its basin before the critic learns its value.
    # 0 (default) = SB3 behavior (actor updates from the start).
    actor_delay_updates: int = 0
    # fixed entropy temperature (SB3's ent_coef=<float> mode): disables
    # auto-tuning. A BC-regularized near-deterministic policy can sit just
    # below the entropy target forever, ratcheting the auto-tuned alpha up
    # until it poisons the critic targets (observed: alpha 0.016 -> 22,
    # Q -> -13k). None (default) = SB3 "auto".
    fixed_alpha: float = None
    # demonstration regularization (SACfD-style): adds
    # bc_coef * is_demo * ||tanh(mu) - a_demo||^2 to the actor loss, pulling
    # the policy toward the scripted driver's actions ON DEMO SAMPLES while
    # the Q term optimizes reward everywhere else. Requires demo-flagged
    # transitions in the buffer (demo_envs / demo_warmup_steps).
    bc_coef: float = 0.0


def alpha_loss_sb3(log_alpha: jnp.ndarray, logp_mean: jnp.ndarray,
                   target_entropy: float) -> jnp.ndarray:
    """SB3's temperature loss: -(log_alpha * (logp + target_entropy)).

    The gradient lands on log_alpha itself (d/dlog_alpha = -(logp + H_bar)),
    not scaled by exp(log_alpha) — matches sb3 sac.py ent_coef_loss."""
    return -(log_alpha * (logp_mean + target_entropy))


@struct.dataclass
class SACState:
    actor_params: Any
    critic_params: Any
    target_critic_params: Any
    log_alpha: jnp.ndarray
    actor_opt: Any
    critic_opt: Any
    alpha_opt: Any
    step: jnp.ndarray


class SAC:
    """Factory holding modules + optimizers; all methods are pure/jittable."""

    def __init__(self, cfg: SACConfig = SACConfig(), obs_channels: int = 9):
        self.cfg = cfg
        self.actor = SquashedGaussianActor()
        self.critic = DoubleQCritic()
        self.obs_channels = obs_channels
        self.opt = optax.adam(cfg.lr)

    def init(self, key: jnp.ndarray, obs_res: int = 64) -> SACState:
        k1, k2 = jax.random.split(key)
        dummy_obs = jnp.zeros((1, self.obs_channels, obs_res, obs_res), jnp.uint8)
        dummy_act = jnp.zeros((1, 2))
        actor_params = self.actor.init(k1, dummy_obs)
        critic_params = self.critic.init(k2, dummy_obs, dummy_act)
        log_alpha = jnp.log(jnp.asarray(self.cfg.init_alpha))
        return SACState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic_params=critic_params,
            log_alpha=log_alpha,
            actor_opt=self.opt.init(actor_params),
            critic_opt=self.opt.init(critic_params),
            alpha_opt=self.opt.init(log_alpha),
            step=jnp.zeros((), jnp.int32),
        )

    def select_action(self, state: SACState, obs: jnp.ndarray,
                      key: jnp.ndarray, deterministic: bool = False
                      ) -> jnp.ndarray:
        """Normalized (-1,1) action; caller rescales to the env box."""
        mu, log_std = self.actor.apply(state.actor_params, obs)
        if deterministic:
            return jnp.tanh(mu)
        a, _ = sample_squashed(mu, log_std, key)
        return a

    def update(self, state: SACState, batch: Dict[str, jnp.ndarray],
               key: jnp.ndarray) -> Tuple[SACState, Dict[str, jnp.ndarray]]:
        cfg = self.cfg
        k_next, k_pi = jax.random.split(key)
        alpha = (jnp.asarray(cfg.fixed_alpha)
                 if cfg.fixed_alpha is not None
                 else jnp.exp(state.log_alpha))

        # --- critic target
        mu_n, std_n = self.actor.apply(state.actor_params, batch["next_obs"])
        next_a, next_logp = sample_squashed(mu_n, std_n, k_next)
        tq1, tq2 = self.critic.apply(state.target_critic_params,
                                     batch["next_obs"], next_a)
        target_v = jnp.minimum(tq1, tq2) - alpha * next_logp
        target_q = batch["reward"] + cfg.gamma * batch["discount_mask"] * target_v
        target_q = jax.lax.stop_gradient(target_q)

        def critic_loss_fn(params):
            q1, q2 = self.critic.apply(params, batch["obs"], batch["action"])
            loss = ((q1 - target_q) ** 2 + (q2 - target_q) ** 2).mean()
            return loss, (q1.mean(), q2.mean())

        (critic_loss, (q1m, q2m)), critic_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.critic_params)

        def actor_loss_fn(params):
            mu, log_std = self.actor.apply(params, batch["obs"])
            a, logp = sample_squashed(mu, log_std, k_pi)
            q1, q2 = self.critic.apply(state.critic_params, batch["obs"], a)
            q = jnp.minimum(q1, q2)
            loss = (alpha * logp - q).mean()
            if cfg.bc_coef:
                demo = batch["is_demo"].astype(jnp.float32)
                # clip targets inside the open interval: the scripted
                # driver saturates accel at EXACTLY +-1, and
                # mse(tanh(mu), +-1) drives mu -> inf (observed actor
                # blow-up + entropy collapse to the log-std floor,
                # artifacts/sac_bcreg_diverge2_r5.jsonl)
                tgt = jnp.clip(batch["action"], -0.98, 0.98)
                bc = (demo * ((jnp.tanh(mu) - tgt) ** 2).sum(-1)).mean()
                loss = loss + cfg.bc_coef * bc
            return loss, logp.mean()

        (actor_loss, logp_mean), actor_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True)(state.actor_params)

        def alpha_loss_fn(log_alpha):
            return alpha_loss_sb3(log_alpha, logp_mean,
                                  cfg.target_entropy), None

        (alpha_loss, _), alpha_grad = jax.value_and_grad(
            alpha_loss_fn, has_aux=True)(state.log_alpha)

        c_up, critic_opt = self.opt.update(critic_grads, state.critic_opt)
        a_up, actor_opt = self.opt.update(actor_grads, state.actor_opt)
        al_up, alpha_opt = self.opt.update(alpha_grad, state.alpha_opt)

        new_critic = optax.apply_updates(state.critic_params, c_up)
        new_target = jax.tree.map(
            lambda t, o: t * (1.0 - cfg.tau) + o * cfg.tau,
            state.target_critic_params, new_critic)

        new_actor = optax.apply_updates(state.actor_params, a_up)
        new_log_alpha = (state.log_alpha if cfg.fixed_alpha is not None
                         else optax.apply_updates(state.log_alpha, al_up))
        if cfg.actor_delay_updates:
            # compute-always / apply-conditionally keeps the program static
            apply = state.step >= cfg.actor_delay_updates
            new_actor = jax.tree.map(
                lambda n, o: jnp.where(apply, n, o),
                new_actor, state.actor_params)
            new_log_alpha = jnp.where(apply, new_log_alpha, state.log_alpha)
            actor_opt = jax.tree.map(
                lambda n, o: jnp.where(apply, n, o) if hasattr(n, "shape")
                else n, actor_opt, state.actor_opt)
            alpha_opt = jax.tree.map(
                lambda n, o: jnp.where(apply, n, o) if hasattr(n, "shape")
                else n, alpha_opt, state.alpha_opt)

        new_state = state.replace(
            actor_params=new_actor,
            critic_params=new_critic,
            target_critic_params=new_target,
            log_alpha=new_log_alpha,
            actor_opt=actor_opt, critic_opt=critic_opt, alpha_opt=alpha_opt,
            step=state.step + 1,
        )
        metrics = dict(critic_loss=critic_loss, actor_loss=actor_loss,
                       alpha_loss=alpha_loss, alpha=alpha,
                       q1=q1m, q2=q2m, entropy=-logp_mean)
        return new_state, metrics
