"""On-device replay buffer with frame-stack reconstruction.

The reference stores frame-stacked observations in SB3's host-side replay
buffer (``VecFrameStack(3)``, reference examples/rl_training.py:160). Storing
stacked uint8 obs on device would cost frame_stack x the HBM; instead we
store each *single* frame once per (env, time) cell and gather the stack at
sample time. Episode boundaries are respected: frames older than the current
episode's start are replaced by the episode's first frame (SB3's
VecFrameStack zero-pads; we repeat the boundary frame which is strictly more
informative and standard in JAX RL stacks — documented deviation).

Truncation bootstrapping (SB3 ``handle_timeout_termination`` semantics): a
transition that ended by TIMEOUT (truncated, not terminated) must bootstrap
through the episode boundary using the episode's true final observation —
zeroing its discount systematically biases value targets on exactly the
successful (200-step) trajectories. The final observation of a truncated
episode is not any buffer cell (the next cell holds the NEW episode's first
frame after in-graph auto-reset), so it is kept in a small side ring:

  term_frames (E, K, C, H, W)  terminal-frame slots, K ~ capacity/64
  term_ptr    (E,) int32       next slot per env (advances on truncation)
  term_slot   (E, N) int32     which slot holds this cell's terminal frame

`add` unconditionally writes the step's final frame into the env's next free
slot and advances the pointer only on truncation — no conditional scatter.
A slot can be recycled while its cell is still sampleable only if more than
K truncations happen within one buffer wrap; truncations occur at most every
`max_environment_steps` (200) steps per env, so K = capacity/64 gives >3x
headroom (documented bound).

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
    term_frames: jnp.ndarray  # (E, K, C, H, W) uint8 truncation-obs side ring
    term_slot: jnp.ndarray   # (E, N) int32 side-ring slot for this cell
    term_ptr: jnp.ndarray    # (E,) int32 next free side-ring slot
    is_demo: jnp.ndarray     # (E, N) bool — action came from the scripted
    #                          demonstration driver (rl/demo.py); lets the
    #                          SAC actor apply a BC term on demo samples only
    pos: jnp.ndarray         # () int32 next write index
    filled: jnp.ndarray      # () int32 number of valid cells per env
    cur_ep_start: jnp.ndarray  # (E,) int32 ring index of the running episode start


def create(num_envs: int, capacity: int, obs_shape: Tuple[int, int, int],
           action_dim: int = 2) -> ReplayBuffer:
    c, h, w = obs_shape
    e, n = num_envs, capacity
    k = max(capacity // 64, 8)
    return ReplayBuffer(
        frames=jnp.zeros((e, n, c, h, w), jnp.uint8),
        action=jnp.zeros((e, n, action_dim), jnp.float32),
        reward=jnp.zeros((e, n), jnp.float32),
        done=jnp.zeros((e, n), bool),
        terminal=jnp.zeros((e, n), bool),
        ep_start=jnp.zeros((e, n), jnp.int32),
        term_frames=jnp.zeros((e, k, c, h, w), jnp.uint8),
        term_slot=jnp.zeros((e, n), jnp.int32),
        term_ptr=jnp.zeros((e,), jnp.int32),
        is_demo=jnp.zeros((e, n), bool),
        pos=jnp.zeros((), jnp.int32),
        filled=jnp.zeros((), jnp.int32),
        cur_ep_start=jnp.zeros((e,), jnp.int32),
    )


def add(buf: ReplayBuffer, frame: jnp.ndarray, action: jnp.ndarray,
        reward: jnp.ndarray, done: jnp.ndarray, terminal: jnp.ndarray,
        final_frame: jnp.ndarray, demo_mask: jnp.ndarray = None
        ) -> ReplayBuffer:
    """Append one transition per env.

    frame: (E, C, H, W) the obs the action was computed FROM; reward/done
    for the resulting step. final_frame: (E, C, H, W) the obs AFTER the step
    *before* any auto-reset (`StepOutput.final_obs`) — the terminal obs of
    the episode when done; stored in the side ring for truncated episodes so
    sampling can bootstrap through timeouts (SB3 handle_timeout_termination).
    """
    e, n = buf.frames.shape[:2]
    k = buf.term_frames.shape[1]
    i = buf.pos % n
    trunc_only = done & ~terminal
    slot = buf.term_ptr % k                                  # (E,)
    env_ids = jnp.arange(e)
    new = buf.replace(
        frames=buf.frames.at[:, i].set(frame),
        action=buf.action.at[:, i].set(action),
        reward=buf.reward.at[:, i].set(reward),
        done=buf.done.at[:, i].set(done),
        terminal=buf.terminal.at[:, i].set(terminal),
        ep_start=buf.ep_start.at[:, i].set(buf.cur_ep_start),
        # write into the next-free slot unconditionally; the pointer only
        # advances (freezing the frame) when this step truncated the episode
        term_frames=buf.term_frames.at[env_ids, slot].set(final_frame),
        term_slot=buf.term_slot.at[:, i].set(slot),
        term_ptr=buf.term_ptr + trunc_only.astype(jnp.int32),
        is_demo=buf.is_demo.at[:, i].set(
            jnp.zeros((e,), bool) if demo_mask is None else demo_mask),
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
    discount_mask, done). SB3 bootstrap semantics:
      - terminated cells: discount 0 (next_obs content is irrelevant);
      - truncated cells: discount 1 and next_obs is the episode's true final
        observation (side-ring frame appended to the cell's own stack) —
        SB3's handle_timeout_termination;
      - ordinary cells: discount 1, next_obs from the following cell.
    """
    e, n = buf.frames.shape[:2]
    c = buf.frames.shape[2]
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
    terminal = buf.terminal[env_idx, idx]
    trunc_only = done & ~terminal
    nxt = (idx + 1) % n
    next_obs = jax.vmap(_stack_at, in_axes=(None, 0, 0, None))(
        buf, env_idx, nxt, frame_stack)
    # truncated cells: true final obs = this cell's stack shifted by the
    # side-ring terminal frame
    term_f = buf.term_frames[env_idx, buf.term_slot[env_idx, idx]]
    trunc_next = jnp.concatenate([obs[:, c:], term_f], axis=1)
    next_obs = jnp.where(trunc_only[:, None, None, None],
                         trunc_next, next_obs)
    return dict(
        obs=obs,
        action=buf.action[env_idx, idx],
        reward=buf.reward[env_idx, idx],
        next_obs=next_obs,
        discount_mask=1.0 - terminal.astype(jnp.float32),
        done=done,
        is_demo=buf.is_demo[env_idx, idx],
    )
