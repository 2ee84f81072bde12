"""Actor/critic heads over the NatureCNN torso.

Covers the policy families the reference trains via SB3
(examples/rl_training.py:166-183):
  - SAC:  squashed-Gaussian actor + twin Q critic (``SquashedGaussianActor``,
          ``DoubleQCritic``)
  - TD3:  deterministic tanh actor + twin Q critic (``DeterministicActor``)
  - PPO/A2C: shared-torso Gaussian actor-critic with state-independent
          log-std (``GaussianActorCritic``)

Actions live in the env's box [(-1, 1), (-0.3, 0.3)] (reference
gym_env.py:83-94); actors emit tanh-squashed values in (-1, 1)^2 which are
rescaled to the box here, so learners operate in normalized space.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from torchdriveenv_tpu.models.cnn import NatureCNN

# env action bounds (reference gym_env.py:83-84)
ACTION_LOW = jnp.array([-1.0, -0.3])
ACTION_HIGH = jnp.array([1.0, 0.3])
LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


def scale_action(tanh_a: jnp.ndarray) -> jnp.ndarray:
    """(-1,1)^2 -> env action box.

    Clips to the box first: Gaussian policies (PPO/A2C) hand over RAW
    samples — SB3 clips exactly here, at the env boundary, while the
    rollout buffer keeps the unclipped sample (on_policy_algorithm
    collect_rollouts). No-op for tanh-squashed (SAC/TD3) actions."""
    a = jnp.clip(tanh_a, -1.0, 1.0)
    return ACTION_LOW + (a + 1.0) * 0.5 * (ACTION_HIGH - ACTION_LOW)


def unscale_action(a: jnp.ndarray) -> jnp.ndarray:
    """env action box -> (-1,1)^2."""
    return 2.0 * (a - ACTION_LOW) / (ACTION_HIGH - ACTION_LOW) - 1.0


class SquashedGaussianActor(nn.Module):
    """SAC actor: NatureCNN -> (mu, log_std); sample -> tanh -> scale."""

    action_dim: int = 2
    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = NatureCNN(self.features, self.compute_dtype, name="torso")(obs)
        h = nn.relu(nn.Dense(256, name="latent")(h))
        mu = nn.Dense(self.action_dim, name="mu")(h)
        log_std = nn.Dense(self.action_dim, name="log_std")(h)
        log_std = jnp.clip(log_std, LOG_STD_MIN, LOG_STD_MAX)
        return mu, log_std


def sample_squashed(mu, log_std, key):
    """Reparameterized tanh-Gaussian sample with its log-prob."""
    std = jnp.exp(log_std)
    noise = jax.random.normal(key, mu.shape)
    pre_tanh = mu + std * noise
    a = jnp.tanh(pre_tanh)
    # log prob with tanh correction (numerically-stable softplus form)
    log_prob = (-0.5 * (noise ** 2) - log_std - 0.5 * jnp.log(2.0 * jnp.pi)
                ).sum(-1)
    log_prob -= (2.0 * (jnp.log(2.0) - pre_tanh - nn.softplus(-2.0 * pre_tanh))
                 ).sum(-1)
    return a, log_prob


class DeterministicActor(nn.Module):
    """TD3 actor: NatureCNN -> tanh action."""

    action_dim: int = 2
    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        h = NatureCNN(self.features, self.compute_dtype, name="torso")(obs)
        h = nn.relu(nn.Dense(256, name="latent")(h))
        return jnp.tanh(nn.Dense(self.action_dim, name="mu")(h))


class DoubleQCritic(nn.Module):
    """Twin Q networks over (obs, action) for SAC/TD3."""

    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray, action: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        qs = []
        for name in ("q1", "q2"):
            h = NatureCNN(self.features, self.compute_dtype,
                          name=f"{name}_torso")(obs)
            h = jnp.concatenate([h, action], axis=-1)
            h = nn.relu(nn.Dense(256, name=f"{name}_h")(h))
            qs.append(nn.Dense(1, name=f"{name}_out")(h)[..., 0])
        return qs[0], qs[1]


class GaussianActorCritic(nn.Module):
    """PPO/A2C: shared NatureCNN torso, Gaussian policy head with learned
    state-independent log-std (SB3 default for Box actions), value head."""

    action_dim: int = 2
    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        h = NatureCNN(self.features, self.compute_dtype, name="torso")(obs)
        mu = nn.Dense(self.action_dim, name="mu",
                      kernel_init=nn.initializers.orthogonal(0.01))(h)
        value = nn.Dense(1, name="value",
                         kernel_init=nn.initializers.orthogonal(1.0))(h)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,))
        log_std = jnp.broadcast_to(log_std, mu.shape)
        return mu, log_std, value


def gaussian_log_prob(mu, log_std, action):
    """Diagonal Gaussian log-prob of `action` (normalized space)."""
    std = jnp.exp(log_std)
    z = (action - mu) / std
    return (-0.5 * z ** 2 - log_std - 0.5 * jnp.log(2.0 * jnp.pi)).sum(-1)


def gaussian_entropy(log_std):
    return (log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e)).sum(-1)
