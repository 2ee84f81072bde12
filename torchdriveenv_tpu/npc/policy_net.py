"""Trainable recurrent NPC behavioral policy — the learnable stand-in for
the Inverted AI DRIVE cloud model.

The reference drives NPCs through per-step network calls to a proprietary
behavioral model carrying a 132-d recurrent state per agent (reference
gym_env.py:198,285-294; iai.py). This module provides the same *interface*
locally: a small GRU policy over per-agent local features whose hidden state
is carried in ``EnvState.npc_hidden``, steppable for the whole padded agent
population inside the jitted env step.

Out of the box the parameters are distilled from the deterministic
rule-based controller (npc/route_follow.py) via ``distill`` — behavior
matches the IDM route follower — and can then be fine-tuned or replaced with
parameters trained on logged trajectories.

Feature vector per agent (all computed from one packed-field gather +
quantities the rule controller also derives):
  [speed/10, target_speed/10, sin/cos heading_err, edge_grad,
   leader_gap/60, leader_dv/10, light_gap/30]
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from torchdriveenv_tpu.maps.arrays import MapArrays, sample_npc_field
from torchdriveenv_tpu.npc import route_follow as rf

HIDDEN = 16
N_FEATURES = 9
ACCEL_SCALE = 4.0
STEER_SCALE = rf.STEER_BOUND


class NpcGRU(nn.Module):
    """GRU + tanh head -> (accel, steer), vmapped over agents."""

    hidden: int = HIDDEN

    @nn.compact
    def __call__(self, h, feats):
        h, y = nn.GRUCell(features=self.hidden)(h, feats)
        y = nn.Dense(self.hidden)(y)
        y = nn.tanh(y)
        out = nn.Dense(2)(y)
        act = jnp.stack([ACCEL_SCALE * jnp.tanh(out[..., 0]),
                         STEER_SCALE * jnp.tanh(out[..., 1])], axis=-1)
        return h, act


def _features(maps: MapArrays, town, t, states, attrs, present, target_speed):
    """Per-agent local features (A, N_FEATURES); pure XLA, one gather."""
    pos, psi, v = states[:, :2], states[:, 2], states[:, 3]
    fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)
    left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)], axis=-1)
    lookahead = jnp.maximum(3.0, v * 0.6)
    # left-offset probe = right-lane keeping, matching the IDM teacher
    probe = pos + fwd * lookahead[:, None] + left * rf.LANE_OFFSET
    dir_tgt, gx, gy = sample_npc_field(maps, town, probe)
    # line-field alignment, matching the IDM teacher (route_follow.py)
    herr = rf._wrap(dir_tgt - psi)
    herr = jnp.where(jnp.abs(herr) > jnp.pi / 2,
                     rf._wrap(herr + jnp.pi), herr)
    edge = gx * left[:, 0] + gy * left[:, 1]

    leader_gap, leader_v = rf.leader_gaps(states, attrs, present)
    light_gap = rf.light_gaps(maps, town, t, states, attrs)
    lg = jnp.clip(jnp.where(jnp.isfinite(leader_gap), leader_gap, 60.0),
                  0.0, 60.0)
    dv = jnp.clip(v - leader_v, -10.0, 10.0)
    sg = jnp.clip(jnp.where(jnp.isfinite(light_gap), light_gap, 30.0),
                  0.0, 30.0)
    return jnp.stack([
        v / 10.0, target_speed / 10.0, jnp.sin(herr), jnp.cos(herr),
        jnp.clip(edge, -1.5, 1.5), lg / 60.0, dv / 10.0, sg / 30.0,
        present.astype(jnp.float32)], axis=-1)


def init_params(key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    model = NpcGRU()
    h = jnp.zeros((HIDDEN,))
    f = jnp.zeros((N_FEATURES,))
    return model.init(key, h, f)


_DEFAULT_PARAMS = None


def params_path() -> str:
    import os

    import torchdriveenv_tpu

    return os.path.join(torchdriveenv_tpu._data_path[0], "npc_gru_v1.msgpack")


def save_params(params, path=None):
    from flax import serialization

    with open(path or params_path(), "wb") as f:
        f.write(serialization.to_bytes(params))


def default_params():
    """Bundled distilled parameters (falls back to a deterministic fresh
    init when no bundle has been compiled yet)."""
    global _DEFAULT_PARAMS
    if _DEFAULT_PARAMS is None:
        import os

        import numpy as _np
        from flax import serialization

        # make_env_fns may run inside a jit trace (the training init_fn).
        # Build the template entirely HOST-SIDE (eval_shape + numpy): a
        # nested flax init would return tracers under the outer trace and
        # caching them globally crashes the next jit (observed the first
        # time a TRAINING run used npc_mode=policy).
        shapes = jax.eval_shape(lambda: init_params(jax.random.PRNGKey(0)))
        rng = _np.random.default_rng(0)
        template = jax.tree.map(
            lambda s: (0.1 * rng.standard_normal(s.shape)).astype(s.dtype),
            shapes)
        path = params_path()
        if os.path.exists(path):
            with open(path, "rb") as f:
                template = serialization.from_bytes(template, f.read())
        _DEFAULT_PARAMS = jax.tree.map(_np.asarray, template)
    return _DEFAULT_PARAMS


def init_hidden(n_agents: int) -> jnp.ndarray:
    """Fresh recurrent state (A, HIDDEN) — the analogue of the reference's
    132-zero fresh-agent recurrent state (gym_env.py:198)."""
    return jnp.zeros((n_agents, HIDDEN))


def npc_policy_actions(params, maps: MapArrays, town, t, states, attrs,
                       present, target_speed, hidden
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(A, 2) actions + next hidden (A, HIDDEN); caller overrides the ego."""
    feats = _features(maps, town, t, states, attrs, present, target_speed)
    model = NpcGRU()
    h, act = jax.vmap(lambda hh, ff: model.apply(params, hh, ff))(hidden, feats)
    # parked agents hold still regardless
    parked = target_speed < 0.1
    v = states[:, 3]
    act = jnp.where(parked[:, None],
                    jnp.stack([jnp.clip(-4.0 * v, *rf.ACCEL_BOUNDS),
                               jnp.zeros_like(v)], axis=-1), act)
    # never reverse (matches the IDM teacher, route_follow.py)
    act = act.at[:, 0].set(jnp.maximum(act[:, 0], -v / 0.1))
    return act, h


def distill(assets, steps: int = 2000, batch: int = 256, lr: float = 3e-4,
            key=None, params=None):
    """Fit the GRU policy to the rule controller on random scenes.

    Returns (params, final_loss). Scenes are sampled from real resets so the
    feature distribution matches deployment."""
    import optax

    from torchdriveenv_tpu.config import EnvConfig
    from torchdriveenv_tpu.env import core

    key = key if key is not None else jax.random.PRNGKey(0)
    params = params if params is not None else init_params(key)
    cfg = EnvConfig()
    tx = optax.adam(lr)
    opt = tx.init(params)
    maps = assets.maps

    def scene_batch(k):
        ks = jax.random.split(k, batch)
        st = jax.vmap(lambda kk: core.reset(cfg, assets, kk))(ks)
        t = st.time0
        return st, t

    def loss_fn(p, st, t, h):
        def one(town, tt, s, a, pr, ts, hh):
            target = rf.npc_actions(maps, town, tt, s, a, pr, ts)
            act, _ = npc_policy_actions(p, maps, town, tt, s, a, pr, ts, hh)
            w = pr.astype(jnp.float32)[:, None]
            return jnp.sum(w * (act - target) ** 2) / jnp.maximum(w.sum(), 1.0)
        losses = jax.vmap(one)(st.town, t, st.agent_states, st.agent_attrs,
                               st.present, st.npc_target_speed, h)
        return losses.mean()

    @jax.jit
    def train_step(p, o, k):
        st, t = scene_batch(k)
        h = jnp.zeros((batch, st.agent_states.shape[1], HIDDEN))
        l, g = jax.value_and_grad(loss_fn)(p, st, t, h)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    loss = None
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt, loss = train_step(params, opt, k)
    return params, float(loss)
