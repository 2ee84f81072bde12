"""Scripted demonstration driver (state-based, jittable).

The competent scripted policy originally built as the winnability-ceiling
probe (tools/diagnose_val.py "drive": waypoint tracking with IDM-style
braking, obstacle dodge/swerve, stopline compliance with yellow-window
handling). Factored into the package so off-policy learners can seed their
replay buffers with demonstration transitions (`demo_warmup_steps` in
RlTrainingConfig) — an off-policy-correct SAC-from-demonstrations warmup:
the buffer starts with trajectories that actually reach the 200-step
truncation, so the critic sees the survival value it must learn instead of
having to stumble onto it. The reference has no analogue (its SB3 baselines
warm up with random actions); this is an opt-in TPU-scale training lever,
documented in TRAINING.md, off by default.

Acts on the *privileged* env state (positions, SDF, light phases), not on
pixels — demonstrations only feed the replay buffer; the learner still
trains its image policy/critics on rendered observations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.maps.arrays import Assets, sample_sdf
from torchdriveenv_tpu.ops.traffic_lights import LightState, light_states_at


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def make_scripted_driver(cfg: EnvConfig, assets: Assets):
    """Returns fn(state_batch) -> (B, 2) env-box actions [accel, steer]."""

    def one(s):
        maps = assets.maps
        ego = s.agent_states[0]
        pos, psi, v = ego[:2], ego[2], ego[3]
        nw = assets.suite.n_waypoints[s.case]
        tgt = jnp.minimum(s.target_idx, nw - 1)
        wp = assets.suite.waypoints[s.case][tgt]
        done_route = s.target_idx >= nw
        # aim half a lane to the stored-coords LEFT of the waypoint (the
        # traffic convention, npc/route_follow.py): the route polyline is
        # the road center and oncoming NPCs hold the other half
        to_wp = wp - pos
        perp = jnp.stack([-to_wp[1], to_wp[0]]) / jnp.maximum(
            jnp.linalg.norm(to_wp), 1e-3)
        aim = wp + 1.6 * perp
        bearing = jnp.arctan2(aim[1] - pos[1], aim[0] - pos[0])
        herr = _wrap(bearing - psi)
        steer = jnp.clip(1.5 * herr, -0.3, 0.3)
        fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)])
        left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)])
        rel = s.agent_states[:, :2] - pos[None]
        lon = rel @ fwd
        lat = rel @ left
        slot = jnp.arange(rel.shape[0])
        ahead = (s.present & (slot != 0) & (lon > 0.0)
                 & (lon < 40.0) & (jnp.abs(lat) < 3.2))
        lon_m = jnp.where(ahead, lon, jnp.inf)
        j = jnp.argmin(lon_m)
        has = jnp.isfinite(lon_m[j])
        # hard-brake point: v^2/2 at the 1 m/s^2 cap + ~5 m of car
        # half-lengths + 5 m buffer (center-to-center distance). ANY agent
        # in the narrow corridor inside stopping distance blocks — tracking
        # only the nearest-ahead lets a passing car in the wide cone mask a
        # parked one dead ahead behind it.
        stop_d = v * v / 2.0 + 12.0
        # cone widens with distance (curved-road visibility, same rationale
        # as npc/route_follow.py emerg_lat)
        narrow = (s.present & (slot != 0) & (lon > 0.0)
                  & (lon < 40.0)
                  & (jnp.abs(lat) < 3.0 + 0.08 * lon))
        block = jnp.any(narrow & (lon < stop_d))
        dodge_sign = jnp.where(lat[j] > 0.2, -1.0, 1.0)
        dodge = jnp.where(
            has & ~block,
            dodge_sign * jnp.clip((40.0 - lon_m[j]) / 40.0,
                                  0.0, 1.0) * 0.25, 0.0)
        steer = jnp.clip(steer + dodge, -0.3, 0.3)
        # imminent (cannot stop in time even at full brake): swerve hard
        # away from the nearest blocker WHILE braking
        lon_n = jnp.where(narrow, lon, jnp.inf)
        jn = jnp.argmin(lon_n)
        imminent = (jnp.isfinite(lon_n[jn])
                    & (lon_n[jn] < v * v / 2.0 + 6.0)
                    & (v > 1.5))
        # swerve only onto pavement: require >=2 m of road on the chosen
        # side (blind full-lock swerves trade collision for offroad)
        sdf_l = sample_sdf(assets.maps, s.town, pos + 3.0 * left)
        sdf_r = sample_sdf(assets.maps, s.town, pos - 3.0 * left)
        away = jnp.where(lat[jn] > 0.0, -1.0, 1.0)
        away_ok = jnp.where(away > 0, sdf_l > 2.0, sdf_r > 2.0)
        other_ok = jnp.where(away > 0, sdf_r > 2.0, sdf_l > 2.0)
        sw = jnp.where(away_ok, away, jnp.where(other_ok, -away, 0.0))
        steer = jnp.where(imminent, 0.3 * sw, steer)
        steer = jnp.where(done_route, 0.0, steer)
        # stoplines: slow near ANY aligned light (green can turn),
        # hard-brake for non-green within stopping distance
        t = s.time0 + s.step_idx.astype(jnp.float32) * cfg.simulator.dt
        sl_mid = (maps.stop_p0[s.town] + maps.stop_p1[s.town]) / 2.0
        rel_sl = sl_mid - pos[None]
        sl_lon = rel_sl @ fwd
        sl_lat = rel_sl @ left
        aligned = jnp.cos(psi - maps.stop_dir[s.town]) > 0.2
        base = (maps.light_mask[s.town] & aligned & (sl_lon > 0.0)
                & (jnp.abs(sl_lat) < 5.0))
        gap = sl_lon - 2.5          # front bumper
        states_l = light_states_at(maps, s.town, t)
        any_gap = jnp.min(jnp.where(base, gap, jnp.inf))
        red_gap = jnp.min(jnp.where(
            base & (states_l != LightState.GREEN), gap, jnp.inf))
        yellow_gap = jnp.min(jnp.where(
            base & (states_l == LightState.YELLOW), gap, jnp.inf))
        # approach-speed cap vs a light that COULD turn
        green_cap = jnp.clip(
            jnp.sqrt(2.0 * jnp.maximum(any_gap - 5.0, 0.0)), 2.0, 6.0)
        v_tgt = jnp.where(jnp.isfinite(any_gap) & (any_gap < 45.0),
                          green_cap, 5.0)
        # slow through turns (visibility + lateral-accel margin)
        v_tgt = jnp.minimum(
            v_tgt, jnp.sqrt(3.0 * 6.0 / jnp.maximum(jnp.abs(herr), 0.05)))
        v_tgt = jnp.where(done_route, 0.0, v_tgt)
        can_stop = red_gap >= v * v / 2.0 + 2.0
        nong = jnp.isfinite(red_gap)
        brake_light = nong & (red_gap < v * v / 2.0 + 6.0)
        # too close to stop when it flipped YELLOW: clear the line before
        # red; on a light already RED, never punch
        clear_past = ~jnp.any(narrow & (lon < red_gap + 14.0)
                              & (jnp.abs(lat) < 2.5))
        g_d, y_d = (maps.light_durations[0], maps.light_durations[1])
        period = maps.light_durations.sum()
        phase = jnp.mod(t + maps.light_phase[s.town], period)
        yrem = jnp.clip(g_d + y_d - phase, 0.0, y_d)      # (L,)
        l_idx = jnp.argmin(jnp.where(
            base & (states_l != LightState.GREEN), gap, jnp.inf))
        t_cross = (red_gap + 4.0) / jnp.maximum(v, 1.0)
        punch = (jnp.isfinite(yellow_gap) & (yellow_gap <= red_gap)
                 & ~can_stop & clear_past
                 & (yrem[l_idx] > t_cross + 0.2))
        brake_light = brake_light & ~punch
        # brake to a STOP, never through it into reverse
        brake_a = jnp.clip(-v / 0.1, -1.0, 1.0)
        cruise = jnp.clip(jnp.where(v > v_tgt, 2.5, 0.8)
                          * (v_tgt - v), -1.0, 1.0)
        accel = jnp.where(
            block, brake_a,
            jnp.where(punch, 1.0,
                      jnp.where(brake_light, brake_a, cruise)))
        return jnp.stack([accel, steer])

    return jax.vmap(one)
