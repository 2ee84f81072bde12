"""On-device replay buffer with frame-stack reconstruction.

The reference stores frame-stacked observations in SB3's host-side replay
buffer (``VecFrameStack(3)``, reference examples/rl_training.py:160). Storing
stacked uint8 obs on device would cost frame_stack x the HBM; instead we
store each *single* frame once per (env, time) cell and gather the stack at
sample time. Episode boundaries are respected: frames older than the current
episode's start are replaced by the episode's first frame (SB3's
VecFrameStack pads the stack with repeated frames after reset... it actually
zero-pads; we repeat the boundary frame which is strictly more informative
and standard in JAX RL stacks — documented deviation).

Layout: ring buffer over time, vectorized over envs:
  frames      (E, N, 3, H, W) uint8
  action      (E, N, A)  normalized (-1,1) space
  reward      (E, N)
  done        (E, N)   episode ended AT this step (terminal or truncation)
  terminal    (E, N)   bootstrap cutoff (terminated, not truncated)
  ep_start    (E, N) int32 ring index of this step's episode start

All ops are pure; the buffer is a pytree (donate it through the train step).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    frames: jnp.ndarray      # (E, N, C, H, W) uint8 — C = 3 (single frame)
    action: jnp.ndarray      # (E, N, A)
    reward: jnp.ndarray      # (E, N)
    done: jnp.ndarray        # (E, N) bool
    terminal: jnp.ndarray    # (E, N) bool
    ep_start: jnp.ndarray    # (E, N) int32
    pos: jnp.ndarray         # () int32 next write index
    filled: jnp.ndarray      # () int32 number of valid cells per env
    cur_ep_start: jnp.ndarray  # (E,) int32 ring index of the running episode start


def create(num_envs: int, capacity: int, obs_shape: Tuple[int, int, int],
           action_dim: int = 2) -> ReplayBuffer:
    c, h, w = obs_shape
    e, n = num_envs, capacity
    return ReplayBuffer(
        frames=jnp.zeros((e, n, c, h, w), jnp.uint8),
        action=jnp.zeros((e, n, action_dim), jnp.float32),
        reward=jnp.zeros((e, n), jnp.float32),
        done=jnp.zeros((e, n), bool),
        terminal=jnp.zeros((e, n), bool),
        ep_start=jnp.zeros((e, n), jnp.int32),
        pos=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        cur_ep_start=jnp.zeros((e,), jnp.int32),
    )


def add(buf: ReplayBuffer, frame: jnp.ndarray, action: jnp.ndarray,
        reward: jnp.ndarray, done: jnp.ndarray, terminal: jnp.ndarray
        ) -> ReplayBuffer:
    """Append one transition per env.

    frame: (E, C, H, W) the obs the action was computed FROM; reward/done for
    the resulting step.
    """
    n = buf.frames.shape[1]
    i = buf.pos % n
    new = buf.replace(
        frames=buf.frames.at[:, i].set(frame),
        action=buf.action.at[:, i].set(action),
        reward=buf.reward.at[:, i].set(reward),
        done=buf.done.at[:, i].set(done),
        terminal=buf.terminal.at[:, i].set(terminal),
        ep_start=buf.ep_start.at[:, i].set(buf.cur_ep_start),
        pos=buf.pos + 1,
        filled=jnp.minimum(buf.filled + 1, n),
        cur_ep_start=jnp.where(done, (i + 1) % n, buf.cur_ep_start),
    )
    return new


def _stack_at(buf: ReplayBuffer, env_idx: jnp.ndarray, idx: jnp.ndarray,
              frame_stack: int) -> jnp.ndarray:
    """Frame-stacked obs (C*frame_stack, H, W) ending at ring index `idx`,
    clamped to the episode start recorded for that cell."""
    n = buf.frames.shape[1]
    start = buf.ep_start[env_idx, idx]
    # age of the sampled cell within its episode (ring distance start->idx)
    age = (idx - start) % n
    offs = jnp.arange(frame_stack - 1, -1, -1)      # oldest..newest
    offs = jnp.minimum(offs, age)                   # clamp at episode start
    ids = (idx - offs) % n
    f = buf.frames[env_idx, ids]                    # (S, C, H, W)
    return f.reshape((-1,) + f.shape[2:])


def sample(buf: ReplayBuffer, key: jnp.ndarray, batch_size: int,
           frame_stack: int = 3):
    """Uniform sample of transitions with stacked obs/next_obs.

    Returns dict(obs (B, S*C, H, W) uint8, action, reward, next_obs,
    discount_mask (0 where terminal)). Cells whose *next* frame is in a
    different episode (done at the cell) are valid: next_obs is then the
    stacked obs at the same cell (unused, masked by discount 0) for
    terminals; for truncation-only dones we avoid sampling the cell by
    resampling weight 0 — SB3 similarly skips buffer edge cells.
    """
    e, n = buf.frames.shape[:2]
    k_env, k_idx = jax.random.split(key)
    env_idx = jax.random.randint(k_env, (batch_size,), 0, e)
    # valid cells: written, and not the most recent cell (its next frame may
    # be unwritten or belong to the next episode write slot)
    upper = jnp.maximum(buf.filled - 1, 1)
    off = jax.random.randint(k_idx, (batch_size,), 0, upper)
    # sample backwards from the last complete cell
    idx = (buf.pos - 2 - off) % n

    obs = jax.vmap(_stack_at, in_axes=(None, 0, 0, None))(
        buf, env_idx, idx, frame_stack)
    done = buf.done[env_idx, idx]
    nxt = (idx + 1) % n
    next_obs = jax.vmap(_stack_at, in_axes=(None, 0, 0, None))(
        buf, env_idx, nxt, frame_stack)
    # where the episode ended at idx, the next frame belongs to a NEW episode
    # (in-graph auto-reset), so discount is zeroed for ALL dones. Deviation
    # from SB3's handle_timeout_termination (which bootstraps at truncation
    # using the stored terminal obs); we don't keep terminal observations.
    return dict(
        obs=obs,
        action=buf.action[env_idx, idx],
        reward=buf.reward[env_idx, idx],
        next_obs=next_obs,
        discount_mask=1.0 - done.astype(jnp.float32),
        done=done,
    )
