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


def traffic_light_violation(maps: MapArrays, town: jnp.ndarray, t: jnp.ndarray,
                            prev_state: jnp.ndarray, state: jnp.ndarray,
                            size: jnp.ndarray) -> jnp.ndarray:
    """Violation metric for one agent: 1.0 when its front bumper CROSSES a
    red stopline this step (from behind the line to on/past it) while heading
    within 90 deg of the approach direction. Compared `> 0` by the env
    (reference gym_env.py:415).

    Crossing-based (event) rather than overlap-based (level) detection: an
    agent that happens to start an episode on top of a stopline, or that is
    already past the line when the light turns red, has not run the light —
    only the act of entering on red is an infraction. This matches the
    reference's semantics where a violation can terminate the episode at the
    moment of the offence (a level test would also re-fire every step while
    straddling the line)."""
    states_l = light_states_at(maps, town, t)                       # (L,)
    red = states_l == LightState.RED

    d = jnp.stack([jnp.cos(maps.stop_dir[town]),
                   jnp.sin(maps.stop_dir[town])], axis=-1)          # (L, 2)
    n = jnp.stack([-d[:, 1], d[:, 0]], axis=-1)                     # (L, 2)
    mid = (maps.stop_p0[town] + maps.stop_p1[town]) / 2.0           # (L, 2)
    half_len = jnp.linalg.norm(maps.stop_p1[town] - maps.stop_p0[town],
                               axis=-1) / 2.0                       # (L,)

    def front(s):
        fwd = jnp.stack([jnp.cos(s[2]), jnp.sin(s[2])])
        return s[:2] + (size[0] / 2.0) * fwd

    p_prev, p_new = front(prev_state), front(state)
    s_prev = jnp.sum((p_prev[None, :] - mid) * d, axis=-1)          # (L,)
    s_new = jnp.sum((p_new[None, :] - mid) * d, axis=-1)
    lat = jnp.abs(jnp.sum((p_new[None, :] - mid) * n, axis=-1))
    crossed = (s_prev < 0.0) & (s_new >= 0.0) & (lat < half_len + size[1] / 2.0)
    aligned = jnp.cos(state[2] - maps.stop_dir[town]) > 0.0
    hit = maps.light_mask[town] & red & crossed & aligned
    return jnp.any(hit).astype(jnp.float32)
