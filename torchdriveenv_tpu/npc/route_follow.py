"""Deterministic local NPC behavioral model.

Replaces the per-step Inverted AI DRIVE network calls that the reference
routes through torchdrivesim's IAIWrapper (reference gym_env.py:285-294;
SURVEY.md L0b). NPCs follow the compiled lane direction field with an IDM
(Intelligent Driver Model) longitudinal controller, keep away from road edges
using the SDF, brake for leaders, and respect red traffic lights.

The controller is a pure function of (map arrays, agent states) -> actions,
fully vectorized over padded agents, so the whole NPC population steps inside
the jitted env step with zero host/network involvement. Log-replay NPCs are
handled separately by the env core (state override, matching IAIWrapper's
replay_states/replay_mask semantics at reference gym_env.py:275-294).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from torchdriveenv_tpu.maps.arrays import MapArrays, sample_npc_field
from torchdriveenv_tpu.ops.traffic_lights import LightState, light_states_at

# IDM parameters (standard motorway values, Treiber et al. 2000)
IDM_A_MAX = 2.0       # max comfortable acceleration (m/s^2)
IDM_B = 3.0           # comfortable deceleration (m/s^2)
IDM_S0 = 2.5          # standstill gap (m)
IDM_T = 1.5           # time headway (s)
ACCEL_BOUNDS = (-4.0, 2.0)
STEER_BOUND = 0.35
LEADER_RANGE = 60.0   # leader search distance (m)
LEADER_LAT = 2.5      # half-width of the leader search corridor (m)
EMERG_RANGE = 16.0    # any-direction obstacle braking distance floor (m)
EMERG_HEADWAY = 1.8   # + speed-proportional term (s): from 10 m/s the -4
#                       m/s^2 bound alone needs 12.5 m — a fixed 16 m window
#                       guarantees T-bones with fast crossing traffic
EMERG_LAT = 3.0       # half-width of the emergency corridor (m)
LANE_OFFSET = 1.75    # right-lane offset from the corridor centerline (m)
LIGHT_RANGE = 30.0    # red-light braking distance (m)
LIGHT_LAT = 4.0


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def leader_gaps(states, attrs, present):
    """Nearest same-direction leader per agent -> (gap (A,), leader_v (A,)).

    gap is +inf when no leader is in range."""
    pos, psi, v = states[:, :2], states[:, 2], states[:, 3]
    length = attrs[:, 0]
    fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)
    left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)], axis=-1)
    rel = pos[None, :, :] - pos[:, None, :]              # (i, j, 2)
    lon = jnp.einsum("ijd,id->ij", rel, fwd)
    lat = jnp.einsum("ijd,id->ij", rel, left)
    cospsi = jnp.cos(psi[None, :] - psi[:, None])
    same_dir = cospsi > -0.2
    pair = present[None, :] & present[:, None] & (lon > 0.0)
    # cruising leader: same-direction traffic ahead in my lane corridor
    is_leader = (pair & (lon < LEADER_RANGE)
                 & (jnp.abs(lat) < LEADER_LAT) & same_dir)
    # emergency obstacle: ANYTHING directly ahead at short range, regardless
    # of its heading — crossing/oncoming traffic at intersections. IAI's
    # behavioral model avoids such collisions; a pure same-direction IDM
    # would plough into crossing streams (and into the ego).
    emerg_d = jnp.maximum(EMERG_RANGE, 10.0 + EMERG_HEADWAY * v)[:, None]
    # cone, not corridor: on curved roads (roundabout ring) an approaching
    # agent 20 m along the arc sits s^2/2R off the heading tangent — a
    # parallel corridor never sees it until the last car length
    emerg_lat = EMERG_LAT + 0.1 * lon
    in_cone = jnp.abs(lat) < emerg_lat
    # near-antiparallel traffic (an opposing stream on a two-way road) sits
    # ~2*LANE_OFFSET = 3.5 m laterally — inside the widened cone beyond
    # ~5 m lon, so two passing NPCs would mutually emergency-brake and
    # stand off. Gate oncoming pairs on closing geometry instead: project
    # the relative velocity, extrapolate lateral offset to the moment of
    # longitudinal closest approach, and only brake when the predicted
    # miss distance is inside one lane width.
    vel = v[:, None] * fwd                               # (A, 2)
    vrel = vel[None, :, :] - vel[:, None, :]             # (i, j, 2)
    vrel_lon = jnp.einsum("ijd,id->ij", vrel, fwd)
    vrel_lat = jnp.einsum("ijd,id->ij", vrel, left)
    closing = -vrel_lon                                  # >0: gap shrinking
    tc = jnp.clip(lon / jnp.maximum(closing, 1e-3), 0.0, 4.0)
    lat_pred = lat + vrel_lat * tc
    oncoming = cospsi < -0.5
    oncoming_hit = (jnp.abs(lat_pred) < 2.0) & (closing > 0.5)
    is_emerg = (pair & (lon < emerg_d)
                & jnp.where(oncoming, oncoming_hit, in_cone))
    a = states.shape[0]
    noself = ~jnp.eye(a, dtype=bool)
    is_obst = (is_leader | is_emerg) & noself
    gap_ij = lon - (length[:, None] + length[None, :]) / 2.0
    gap_ij = jnp.where(is_obst, gap_ij, jnp.inf)
    j_star = jnp.argmin(gap_ij, axis=1)
    gap = jnp.min(gap_ij, axis=1)
    # obstacle speed projected onto MY heading: an oncoming car closes the
    # gap at v_i + v_j, which the projection makes IDM treat correctly.
    # The j_star row is selected via an iota==argmin mask instead of
    # v[j_star]/psi[j_star]: batched 1-D gathers lower to serialized dynamic
    # slices on TPU and cost ~17 ms/step at 4096 envs, the masked reduction
    # is pure VPU work on the (A, A) tile already in registers (bit-identical
    # result; measured 47 -> 30 ms for the full controller).
    onehot = (jax.lax.broadcasted_iota(jnp.int32, gap_ij.shape, 1)
              == j_star[:, None])
    v_proj = jnp.sum(jnp.where(onehot, v[None, :] * cospsi, 0.0), axis=1)
    leader_v = jnp.where(jnp.isfinite(gap), v_proj, 0.0)
    return gap, leader_v


def light_gaps(maps: MapArrays, town, t, states, attrs):
    """Distance to the nearest blocking (non-green) stopline per agent, +inf
    when none applies."""
    pos, psi = states[:, :2], states[:, 2]
    length = attrs[:, 0]
    fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)
    left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)], axis=-1)
    sl_mid = (maps.stop_p0[town] + maps.stop_p1[town]) / 2.0  # (L, 2)
    rel_sl = sl_mid[None, :, :] - pos[:, None, :]
    sl_lon = jnp.einsum("ild,id->il", rel_sl, fwd)
    sl_lat = jnp.einsum("ild,id->il", rel_sl, left)
    red = light_states_at(maps, town, t) != LightState.GREEN   # stop on yellow+red
    aligned = jnp.cos(psi[:, None] - maps.stop_dir[town][None, :]) > 0.5
    sl_active = (maps.light_mask[town][None, :] & red[None, :] & aligned
                 & (sl_lon > 0.0) & (sl_lon < LIGHT_RANGE)
                 & (jnp.abs(sl_lat) < LIGHT_LAT))
    sl_gap = jnp.where(sl_active, sl_lon - length[:, None] / 2.0 - 1.0, jnp.inf)
    return jnp.min(sl_gap, axis=1)


def npc_actions(maps: MapArrays, town: jnp.ndarray, t: jnp.ndarray,
                states: jnp.ndarray, attrs: jnp.ndarray, present: jnp.ndarray,
                target_speed: jnp.ndarray) -> jnp.ndarray:
    """Compute (A, 2) [accel, steering] for all agents (caller masks the ego).

    states (A, 4), attrs (A, 3) [length, width, lr], present (A,),
    target_speed (A,) desired cruise speed (0 => parked).
    """
    pos = states[:, :2]
    psi = states[:, 2]
    v = states[:, 3]
    length = attrs[:, 0]
    fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)
    left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)], axis=-1)

    # ---- lateral control: track the direction field + stay off road edges.
    # The probe is offset to the agent's RIGHT by LANE_OFFSET: the
    # edge-keeping term centers the PROBE in the corridor, which places the
    # BODY one half-lane to the stored-coordinates LEFT of the centerline.
    # Lane-side is measured, not assumed: across the reference's 75 cached
    # IAI background-traffic files (real IAI initialize output), all 1,929
    # oncoming agent pairs within 12 m have the opposing stream on the
    # agent's stored-coords RIGHT (mean lateral offset -3.8 m) — in these
    # left-handed CARLA coordinates (reference gym_env.py:46-49) keep-LEFT in
    # raw array math is what renders as right-hand traffic. The reference's
    # own validation placements agree: case 2's southbound ego route hugs the
    # east side (x~153) while the northbound agent holds the west lane
    # (x~149.5), reference validation_cases.yml.
    lookahead = jnp.maximum(3.0, v * 0.6)
    probe = (pos + fwd * lookahead[:, None] - left * LANE_OFFSET)
    # ONE gather per agent: lane direction + SDF gradient at the lookahead
    # point (packed field). Edge keeping previews the road-centering error at
    # the probe: 0.24*(grad.left) ~ the 0.08*(sdf_l - sdf_r) finite diff.
    dir_tgt, gx, gy = sample_npc_field(maps, town, probe)
    # LINE-field alignment: the compiled direction field is single-valued per
    # pixel (the nearest corridor segment's direction), but real roads carry
    # two-way traffic. An agent heading the opposite way must follow the
    # REVERSED field — treating the field as a vector field would steer every
    # oncoming car into a U-turn across the ego's lane. (The reference's IAI
    # agents keep their own lane direction; validation cases 0 and 2 place
    # oncoming traffic explicitly, reference validation_cases.yml scenarios.)
    heading_err = _wrap(dir_tgt - psi)
    heading_err = jnp.where(jnp.abs(heading_err) > jnp.pi / 2,
                            _wrap(heading_err + jnp.pi), heading_err)
    edge_err = jnp.clip(0.24 * (gx * left[:, 0] + gy * left[:, 1]), -0.2, 0.2)
    steer = jnp.clip(1.5 * heading_err + edge_err, -STEER_BOUND, STEER_BOUND)

    # ---- longitudinal control: IDM against the nearest leader; red lights
    # become stationary obstacles at the stopline
    leader_gap, leader_v = leader_gaps(states, attrs, present)
    light_gap = light_gaps(maps, town, t, states, attrs)

    use_light = light_gap < leader_gap
    gap = jnp.where(use_light, light_gap, leader_gap)
    lead_speed = jnp.where(use_light, 0.0, leader_v)
    gap = jnp.maximum(gap, 0.1)

    # curvature comfort cap: |heading_err| over the ~6 m lookahead estimates
    # the local turn rate; bound lateral accel v^2*kappa at ~3 m/s^2 so ring
    # and corner traffic slows like real drivers (IAI agents negotiate the
    # Town02 roundabout well below the straight-road cruise speeds cached in
    # the background files)
    v_curve = jnp.sqrt(3.0 * 6.0 / jnp.maximum(jnp.abs(heading_err), 0.05))
    v0 = jnp.maximum(jnp.minimum(target_speed, v_curve), 0.1)
    dv = v - lead_speed
    s_star = IDM_S0 + v * IDM_T + v * dv / (2.0 * jnp.sqrt(IDM_A_MAX * IDM_B))
    s_star = jnp.maximum(s_star, 0.0)
    interaction = jnp.where(jnp.isfinite(gap), (s_star / gap) ** 2, 0.0)
    accel = IDM_A_MAX * (1.0 - (jnp.maximum(v, 0.0) / v0) ** 4 - interaction)
    accel = jnp.clip(accel, *ACCEL_BOUNDS)

    # parked agents (target_speed ~ 0) hold still
    parked = target_speed < 0.1
    accel = jnp.where(parked, jnp.clip(-4.0 * v, *ACCEL_BOUNDS), accel)
    steer = jnp.where(parked, 0.0, steer)
    # never reverse: braking at most cancels the current speed within one
    # 0.1 s step (an emergency-braking IDM would otherwise oscillate through
    # v=0 and back slowly INTO following traffic)
    accel = jnp.maximum(accel, -v / 0.1)
    return jnp.stack([accel, steer], axis=-1)
