"""Jitted rollout machinery: frame stacking + on-/off-policy collectors.

The reference composes SB3 ``SubprocVecEnv`` + ``VecFrameStack(3)``
(examples/rl_training.py:159-160) with host-side rollout loops. Here the
stacked observation is carried as part of a `RolloutState` pytree and the
entire collection loop is a `lax.scan` inside one XLA program — no host
round-trips between env steps and action selection.

Frame-stack semantics: the stack holds the last `frame_stack` single frames
channel-concatenated oldest-first (SB3 layout). After an in-graph auto-reset
the stack is refilled with the new episode's first frame repeated (SB3
zero-pads instead — documented deviation, see rl/buffer.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from torchdriveenv_tpu.env.batched import StepOutput


@struct.dataclass
class RolloutState:
    env_state: Any              # batched EnvState
    obs_stack: jnp.ndarray      # (E, S*C, H, W) uint8
    key: jnp.ndarray


def init_stack(obs: jnp.ndarray, frame_stack: int) -> jnp.ndarray:
    """First-frame-repeated stack (E, S*C, H, W) from single frames (E, C, H, W)."""
    return jnp.tile(obs, (1, frame_stack, 1, 1))


def update_stack(stack: jnp.ndarray, new_frame: jnp.ndarray,
                 done: jnp.ndarray) -> jnp.ndarray:
    """Shift in the newest frame; refill on episode boundary."""
    c = new_frame.shape[1]
    shifted = jnp.concatenate([stack[:, c:], new_frame], axis=1)
    refilled = jnp.tile(new_frame, (1, stack.shape[1] // c, 1, 1))
    return jnp.where(done[:, None, None, None], refilled, shifted)


def make_collector(step_fn: Callable[[Any, jnp.ndarray], StepOutput],
                   select_action: Callable, frame_stack: int,
                   scale_action: Callable[[jnp.ndarray], jnp.ndarray]):
    """On-policy collector: scan `n_steps`, returning time-major arrays.

    select_action(obs_stack, key) -> (norm_action, log_prob, value).
    """

    def collect(rs: RolloutState, n_steps: int
                ) -> Tuple[RolloutState, Dict[str, jnp.ndarray]]:
        def one(rs: RolloutState, _):
            k_act, k_next = jax.random.split(rs.key)
            a, logp, value = select_action(rs.obs_stack, k_act)
            out = step_fn(rs.env_state, scale_action(a))
            done = out.terminated | out.truncated
            data = dict(obs=rs.obs_stack, action=a, log_prob=logp,
                        value=value, reward=out.reward, done=done,
                        info=out.info)
            new_stack = update_stack(rs.obs_stack, out.obs, done)
            return RolloutState(out.state, new_stack, k_next), data

        rs, data = jax.lax.scan(one, rs, None, length=n_steps)
        return rs, data

    return collect


def make_offpolicy_step(step_fn: Callable[[Any, jnp.ndarray], StepOutput],
                        select_action: Callable, frame_stack: int,
                        scale_action: Callable[[jnp.ndarray], jnp.ndarray],
                        buffer_add: Callable):
    """Off-policy: one env step for all envs + replay insertion, jittable.

    select_action(obs_stack, key) -> norm_action (E, A).
    The single (un-stacked) current frame is the stack's newest slice.
    """

    def one(rs: RolloutState, buf, *, random_action_key=None):
        k_act, k_next = jax.random.split(rs.key)
        if random_action_key is not None:
            a = jax.random.uniform(random_action_key,
                                   (rs.obs_stack.shape[0], 2),
                                   minval=-1.0, maxval=1.0)
        else:
            a = select_action(rs.obs_stack, k_act)
        out = step_fn(rs.env_state, scale_action(a))
        done = out.terminated | out.truncated
        c = rs.obs_stack.shape[1] // frame_stack
        cur_frame = rs.obs_stack[:, -c:]
        final = out.final_obs if out.final_obs is not None else out.obs
        buf = buffer_add(buf, cur_frame, a, out.reward, done, out.terminated,
                         final)
        new_stack = update_stack(rs.obs_stack, out.obs, done)
        return RolloutState(out.state, new_stack, k_next), buf, out

    return one
