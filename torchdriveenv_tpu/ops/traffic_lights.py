"""Traffic-light state machine + stopline violation test.

Replaces torchdrivesim's time-driven traffic_light_controller and
`compute_traffic_lights_violations()` (reference gym_env.py:181-189,144,415).
Each light cycles green -> yellow -> red with a fixed period and a per-light
phase offset, all as pure array arithmetic. A violation occurs when an
agent's oriented box overlaps a stopline segment whose light is red while the
agent is moving in the stopline's approach direction.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp

from torchdriveenv_tpu.maps.arrays import MapArrays


class LightState(enum.IntEnum):
    GREEN = 0
    YELLOW = 1
    RED = 2


def light_states_at(maps: MapArrays, town: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Light states (L,) int32 for town at simulation time t (seconds)."""
    g, y, r = (maps.light_durations[0], maps.light_durations[1],
               maps.light_durations[2])
    period = g + y + r
    phase = jnp.mod(t + maps.light_phase[town], period)
    return jnp.where(phase < g, LightState.GREEN,
                     jnp.where(phase < g + y, LightState.YELLOW, LightState.RED)
                     ).astype(jnp.int32)


def _segment_obb_overlap(p0, p1, state, size):
    """SAT overlap between segment p0-p1 (L,2 each) and one OBB (4,)/(2,).

    A segment is a degenerate rectangle; candidate axes are the box's two axes
    and the segment normal. Returns (L,) bool.
    """
    c = jnp.stack([state[0], state[1]])
    psi = state[2]
    hl, hw = size[0] / 2.0, size[1] / 2.0
    ax = jnp.stack([jnp.cos(psi), jnp.sin(psi)])
    ay = jnp.stack([-jnp.sin(psi), jnp.cos(psi)])

    mid = (p0 + p1) / 2.0            # (L, 2)
    half = (p1 - p0) / 2.0           # (L, 2)
    seg_len = jnp.linalg.norm(half, axis=-1) + 1e-9
    n = jnp.stack([-half[:, 1], half[:, 0]], axis=-1) / seg_len[:, None]

    d = mid - c[None, :]             # (L, 2)

    def sep(axis, box_r, seg_r):
        # axis (L,2); separated if |d.axis| > box_r + seg_r
        return jnp.abs(jnp.sum(d * axis, axis=-1)) > box_r + seg_r

    seg_r_on = lambda axis: jnp.abs(jnp.sum(half * axis, axis=-1))
    box_r_on = lambda axis: (hl * jnp.abs(axis @ ax) + hw * jnp.abs(axis @ ay))

    ax_b = jnp.broadcast_to(ax, d.shape)
    ay_b = jnp.broadcast_to(ay, d.shape)
    separated = (
        sep(ax_b, hl, seg_r_on(ax_b))
        | sep(ay_b, hw, seg_r_on(ay_b))
        | sep(n, box_r_on(n), 0.0)
    )
    return ~separated


def traffic_light_violation(maps: MapArrays, town: jnp.ndarray, t: jnp.ndarray,
                            state: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Violation metric for one agent: 1.0 if its box overlaps any red-light
    stopline it is approaching (heading within 90 deg of the approach
    direction), else 0.0. Compared `> 0` by the env (gym_env.py:415)."""
    states_l = light_states_at(maps, town, t)                       # (L,)
    red = states_l == LightState.RED
    overlap = _segment_obb_overlap(maps.stop_p0[town], maps.stop_p1[town],
                                   state, size)                     # (L,)
    aligned = jnp.cos(state[2] - maps.stop_dir[town]) > 0.0
    moving = state[3] > 0.1
    hit = maps.light_mask[town] & red & overlap & aligned & moving
    return jnp.any(hit).astype(jnp.float32)
