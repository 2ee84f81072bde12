"""Environment core: `reset` and `step` as pure, vmap-able functions.

This is the TPU-native rebuild of the reference's `WaypointSuiteEnv` +
`build_simulator` (reference gym_env.py:179-300,303-437). Where the reference
constructs a fresh Python object tree per episode (map config lookup,
background-traffic JSON parsing, IAI network initialization, wrapper stack),
here an episode reset is pure array arithmetic over preloaded padded assets,
cheap enough to run *inside* the lockstep batched step for auto-reset.

Reward, termination, info and all sampling distributions replicate the
reference exactly (citations inline). NPCs are local and deterministic
(npc/route_follow.py) instead of Inverted AI network calls.

Agent slot layout (matches the reference's merged agent array, ego first,
gym_env.py:219,269-271):
    slot 0            ego
    slots 1..S        scenario-predefined agents (validation cases)
    slots S+1..A-1    background traffic + locally spawned traffic
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from torchdriveenv_tpu.config import CollisionMetric, EnvConfig
from torchdriveenv_tpu.maps.arrays import (
    Assets,
    sample_dir_angle,
    sample_sdf_grad,
    sample_sdf_nearest,
)
from torchdriveenv_tpu.npc.route_follow import npc_actions
from torchdriveenv_tpu.ops.bicycle import bicycle_step
from torchdriveenv_tpu.ops.collision import ego_collision, ego_collision_discs
from torchdriveenv_tpu.ops.offroad import compute_offroad
from torchdriveenv_tpu.ops.traffic_lights import traffic_light_violation
from torchdriveenv_tpu.ops.waypoints import waypoint_reached

# action bounds (reference gym_env.py:83-84)
ACTION_LOW = jnp.array([-1.0, -0.3])
ACTION_HIGH = jnp.array([1.0, 0.3])

# local traffic genesis (stand-in for IAI initialize, reference iai.py:33-41):
SPAWN_GRID = 8              # 8x8 candidate cells over the FOV window
SPAWN_FOV = 120.0           # IAI INITIALIZE_FOV (reference iai.py:9)
SPAWN_JITTER = 11.0         # uniform jitter inside a cell (m)
SPAWN_MIN_EGO_DIST = 20.0
SPAWN_MIN_AGENT_DIST = 9.0
SPAWN_SDF_MARGIN = 1.2      # candidate must be this deep inside the road (m)
SPAWN_PROJECT_MAX = 14.0    # max per-iteration SDF-gradient projection (m)
TOTAL_AGENT_TARGET = 95     # reference requests max(95 - n, density) agents (gym_env.py:237)
BG_FAR_DIST = 100.0         # background agents nearer than this are replaced (gym_env.py:232)


@struct.dataclass
class EnvState:
    """Complete per-env simulation state (a pytree of arrays)."""

    town: jnp.ndarray           # () int32
    case: jnp.ndarray           # () int32 scenario index
    agent_states: jnp.ndarray   # (A, 4) [x, y, psi, speed]
    agent_attrs: jnp.ndarray    # (A, 3) [length, width, rear_axis_offset]
    present: jnp.ndarray        # (A,) bool
    npc_target_speed: jnp.ndarray  # (A,) desired cruise speed
    step_idx: jnp.ndarray       # () int32 steps taken this episode
    time0: jnp.ndarray          # () f32 traffic-light phase offset (s)
    target_idx: jnp.ndarray     # () int32 current waypoint target (starts at 1)
    reached_num: jnp.ndarray    # () int32 waypoints reached this episode
    rng: jnp.ndarray            # PRNG key for any stochastic NPC extensions
    # (A, H) GRU state when cfg.npc_mode == "policy", else None — the local
    # analogue of the reference's per-NPC 132-d recurrent state
    # (gym_env.py:198, background JSON recurrent_states.packed)
    npc_hidden: Optional[jnp.ndarray] = None


def _num_fixed(assets: Assets) -> int:
    return 1 + assets.suite.scen_states.shape[1]


def max_agents(assets: Assets) -> int:
    return assets.background.bg_states.shape[2]


def _spawn_cell_centers():
    """Static jitter-grid cell centers, ordered closest-to-ego first.

    The ordering is compile-time (cells are ego-relative), which replaces the
    runtime argsort-by-distance the spawner would otherwise need — spawn
    priority still densifies around the ego like IAI initialize."""
    import numpy as np

    cell = 2.0 * SPAWN_FOV / SPAWN_GRID
    ii = np.arange(SPAWN_GRID, dtype=np.float32)
    centers = -SPAWN_FOV + cell * (ii + 0.5)
    gx, gy = np.meshgrid(centers, centers, indexing="ij")
    base = np.stack([gx.ravel(), gy.ravel()], axis=-1)
    order = np.argsort(np.hypot(base[:, 0], base[:, 1]), kind="stable")
    return base[order]                      # numpy: safe to embed in traces


_SPAWN_BASE = _spawn_cell_centers()


def _spawn_candidates(key, maps, town, ego_xy, fixed_xy, fixed_present):
    """Local traffic genesis: jittered-grid candidates near the ego, on-road,
    clear of existing agents. Returns (n_cand, 4) states, (n_cand, 3) attrs,
    (n_cand,) speeds, (n_cand,) valid, ranked ~closest-to-ego first."""
    n = SPAWN_GRID * SPAWN_GRID
    k_xy, k_psi, k_speed, k_len, k_wid, k_lr = jax.random.split(key, 6)
    jitter = jax.random.uniform(k_xy, (n, 2), minval=-SPAWN_JITTER, maxval=SPAWN_JITTER)
    pos = ego_xy[None, :] + _SPAWN_BASE + jitter

    # project candidates onto the drivable area along the SDF gradient (the
    # SDF is an exact distance outside the road, so two Newton steps land
    # candidates within a pixel of the corridor). Off-road cells would
    # otherwise be rejected wholesale and traffic density would depend on
    # how much of the jitter grid happens to overlap pavement — the
    # reference's IAI initialize reliably seeds ~95 agents (gym_env.py:237).
    for _ in range(2):
        sdf_p = sample_sdf_nearest(maps, town, pos)
        gx, gy = sample_sdf_grad(maps, town, pos)
        g = jnp.stack([gx, gy], axis=-1)
        g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-3)
        need = jnp.clip(SPAWN_SDF_MARGIN + 0.8 - sdf_p, 0.0, SPAWN_PROJECT_MAX)
        pos = pos + need[:, None] * g

    sdf = sample_sdf_nearest(maps, town, pos)
    d_ego = jnp.linalg.norm(pos - ego_xy[None, :], axis=-1)
    d_fixed = jnp.linalg.norm(pos[:, None, :] - fixed_xy[None, :, :], axis=-1)
    d_fixed = jnp.where(fixed_present[None, :], d_fixed, jnp.inf)
    # projection can clump neighboring cells onto the same lane: enforce
    # candidate-candidate spacing against earlier (closer-to-ego) cells.
    # Only candidates that can themselves spawn suppress later ones — an
    # off-road or near-ego cell never materializes, so counting it would
    # drop valid spawns and undershoot the ~95-agent density target.
    base_valid = ((sdf > SPAWN_SDF_MARGIN)
                  & (d_ego > SPAWN_MIN_EGO_DIST) & (d_ego < SPAWN_FOV)
                  & (jnp.min(d_fixed, axis=-1) > SPAWN_MIN_AGENT_DIST))
    d_cand = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=-1)
    earlier = jnp.tril(jnp.ones((n, n), bool), k=-1) & base_valid[None, :]
    d_prev = jnp.min(jnp.where(earlier, d_cand, jnp.inf), axis=-1)
    valid = base_valid & (d_prev > SPAWN_MIN_AGENT_DIST)

    psi = sample_dir_angle(maps, town, pos) + 0.05 * jax.random.normal(k_psi, (n,))
    speed = jax.random.uniform(k_speed, (n,), minval=2.0, maxval=8.0)
    states = jnp.concatenate([pos, psi[:, None], speed[:, None]], axis=-1)
    attrs = jnp.stack([
        jax.random.uniform(k_len, (n,), minval=4.2, maxval=5.2),
        jax.random.uniform(k_wid, (n,), minval=1.8, maxval=2.1),
        jax.random.uniform(k_lr, (n,), minval=0.9, maxval=1.6),
    ], axis=-1)
    return states, attrs, speed, valid


def reset(cfg: EnvConfig, assets: Assets, key: jnp.ndarray,
          case: Optional[jnp.ndarray] = None) -> EnvState:
    """Start a new episode (reference WaypointSuiteEnv.reset, gym_env.py:319-349).

    `case`: optional fixed scenario index (evaluation / golden-trajectory
    harness); None samples uniformly like the reference.

    Sampling distributions match the reference:
      - case uniform over the suite               (gym_env.py:320)
      - start point uniform on segment wp0->wp1   (gym_env.py:357)
      - start speed U(0, 10)                      (gym_env.py:358)
      - heading = lane direction + N(0, 0.1)      (gym_env.py:359-361)
      - ego-only sizes: U(4.8,5.5) x U(1.8,2.2), lr U(0.82,0.97) (gym_env.py:194-196)
      - background file uniform over valid caches (gym_env.py:204-217)
    """
    suite, bg, maps = assets.suite, assets.background, assets.maps
    a_max = max_agents(assets)
    s_max = suite.scen_states.shape[1]
    n_fixed = 1 + s_max

    (k_case, k_start, k_speed, k_head, k_attr, k_bgfile, k_spawn, k_phase,
     k_carry) = jax.random.split(key, 9)

    if case is None:
        case = jax.random.randint(k_case, (), 0, suite.case_town.shape[0])
    else:
        case = jnp.asarray(case, jnp.int32)
    town = suite.case_town[case]
    wps = suite.waypoints[case]
    frac = jax.random.uniform(k_start)
    start_xy = wps[0] + frac * (wps[1] - wps[0])
    start_speed = jax.random.uniform(k_speed) * 10.0
    heading = (sample_dir_angle(maps, town, start_xy)
               + 0.1 * jax.random.normal(k_head))
    ego_state = jnp.concatenate([start_xy, heading[None], start_speed[None]])

    # background file choice (uniform over valid caches for this town)
    valid = bg.bg_valid[town]
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    bg_file = jax.random.choice(k_bgfile, bg.bg_valid.shape[1], p=probs)

    ku1, ku2, ku3 = jax.random.split(k_attr, 3)
    if cfg.ego_only:
        ego_attrs = jnp.stack([
            jax.random.uniform(ku1) * (5.5 - 4.8) + 4.8,
            jax.random.uniform(ku2) * (2.2 - 1.8) + 1.8,
            jax.random.uniform(ku3) * (0.97 - 0.82) + 0.82,
        ])
    else:
        # traffic mode: ego takes the cache's first agent attributes
        # (reference gym_env.py:220)
        ego_attrs = bg.bg_attrs[town, bg_file, 0]

    states = jnp.zeros((a_max, 4))
    attrs = jnp.ones((a_max, 3))
    present = jnp.zeros((a_max,), bool)
    target_speed = jnp.zeros((a_max,))

    states = states.at[0].set(ego_state)
    attrs = attrs.at[0].set(ego_attrs)
    present = present.at[0].set(True)

    if not cfg.ego_only:
        # fixed slots 1..S: scenario-predefined agents
        states = states.at[1:n_fixed].set(suite.scen_states[case])
        attrs = attrs.at[1:n_fixed].set(
            jnp.where(suite.scen_mask[case][:, None], suite.scen_attrs[case], 1.0))
        present = present.at[1:n_fixed].set(suite.scen_mask[case])
        target_speed = target_speed.at[1:n_fixed].set(
            jnp.where(suite.scen_mask[case], suite.scen_states[case][:, 3], 0.0))

        tail_cap = a_max - n_fixed
        if cfg.use_background_traffic:
            bg_states = bg.bg_states[town, bg_file][:tail_cap]
            bg_attrs_f = bg.bg_attrs[town, bg_file][:tail_cap]
            bg_present = bg.bg_mask[town, bg_file][:tail_cap]
            # keep only agents far from the ego (reference gym_env.py:230-235)
            d = jnp.linalg.norm(bg_states[:, :2] - start_xy[None, :], axis=-1)
            bg_present = bg_present & (d > BG_FAR_DIST)
            density = bg.bg_density[town, bg_file]
        else:
            # traffic mode without the cached files: intentional extension.
            # In the reference, iai_conditional_initialize sits INSIDE the
            # `if cfg.use_background_traffic:` branch (gym_env.py:200-238),
            # so use_background_traffic=False with ego_only=False would hit
            # an unbound agent_states and crash — a config it cannot
            # execute. Here local genesis fills the whole tail instead.
            bg_states = jnp.zeros((tail_cap, 4))
            bg_attrs_f = jnp.ones((tail_cap, 3))
            bg_present = jnp.zeros((tail_cap,), bool)
            density = jnp.zeros((), jnp.int32)
        # local genesis near the ego replaces iai.api.initialize
        fixed_xy = jnp.concatenate([states[:n_fixed, :2], bg_states[:, :2]])
        fixed_present = jnp.concatenate([present[:n_fixed], bg_present])
        sp_states, sp_attrs, sp_speed, sp_valid = _spawn_candidates(
            k_spawn, maps, town, start_xy, fixed_xy, fixed_present)
        n_remain = (1 + suite.scen_mask[case].sum() + bg_present.sum())
        k_needed = jnp.maximum(TOTAL_AGENT_TARGET - n_remain, density)
        sp_rank = jnp.cumsum(sp_valid) - 1
        sp_present = sp_valid & (sp_rank < k_needed)

        # pack: background agents keep their tail slot; spawned agents
        # (closest-first) fill the gaps. Two cumsums + one small gather —
        # replaces a (tail+spawn)-length argsort compaction.
        n_sp = sp_present.shape[0]
        gap = ~bg_present                             # (tail_cap,)
        gap_rank = jnp.cumsum(gap) - 1
        lut = jnp.full((tail_cap + 1,), n_sp, jnp.int32)
        lut = lut.at[jnp.where(sp_present,
                               jnp.minimum(sp_rank, tail_cap),
                               tail_cap)].set(
            jnp.arange(n_sp, dtype=jnp.int32), mode="drop")
        j_fill = lut[jnp.clip(gap_rank, 0, tail_cap - 1)]
        sp_rows = jnp.concatenate([
            sp_states, sp_attrs, sp_speed[:, None],
            jnp.ones((n_sp, 1))], axis=-1)            # (n_sp, 9)
        sp_rows = jnp.concatenate([sp_rows, jnp.zeros((1, 9))])
        fill = sp_rows[j_fill]                        # (tail_cap, 9)
        use_fill = gap & (j_fill < n_sp)
        states = states.at[n_fixed:].set(
            jnp.where(bg_present[:, None], bg_states, fill[:, :4]))
        attrs = attrs.at[n_fixed:].set(
            jnp.where(bg_present[:, None], bg_attrs_f, fill[:, 4:7]))
        present = present.at[n_fixed:].set(bg_present | use_fill)
        target_speed = target_speed.at[n_fixed:].set(
            jnp.where(bg_present, bg_states[:, 3],
                      jnp.where(use_fill, fill[:, 7], 0.0)))

    period = maps.light_durations.sum()
    time0 = jax.random.uniform(k_phase) * period

    if cfg.npc_mode == "policy":
        from torchdriveenv_tpu.npc.policy_net import init_hidden
        npc_hidden = init_hidden(a_max)
    else:
        npc_hidden = None

    return EnvState(
        npc_hidden=npc_hidden,
        town=town, case=case,
        agent_states=states, agent_attrs=attrs, present=present,
        npc_target_speed=target_speed,
        step_idx=jnp.zeros((), jnp.int32),
        time0=time0,
        target_idx=jnp.ones((), jnp.int32),   # reference gym_env.py:325
        reached_num=jnp.zeros((), jnp.int32),
        rng=k_carry,
    )


def step(cfg: EnvConfig, assets: Assets, state: EnvState, action: jnp.ndarray,
         npc_params=None,
         ) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One env step (reference WaypointSuiteEnv.step + GymEnv.step + reward/
    termination/info, gym_env.py:115-120,369-437).

    action: (2,) [acceleration, steering], clipped to the env action space.
    npc_params: GRU policy params when cfg.npc_mode == "policy".
    Returns (next_state, reward, terminated, truncated, info).
    """
    suite, maps = assets.suite, assets.maps
    dt = cfg.simulator.dt
    last_ego = state.agent_states[0]
    t_now = state.time0 + state.step_idx.astype(jnp.float32) * dt

    # --- NPC behavioral stepping (IAI DRIVE stand-in) + ego action
    npc_hidden = state.npc_hidden
    if cfg.npc_mode == "policy":
        from torchdriveenv_tpu.npc.policy_net import (
            default_params,
            npc_policy_actions,
        )
        params = npc_params if npc_params is not None else default_params()
        npc_act, npc_hidden = npc_policy_actions(
            params, maps, state.town, t_now, state.agent_states,
            state.agent_attrs, state.present, state.npc_target_speed,
            state.npc_hidden)
    else:
        npc_act = npc_actions(maps, state.town, t_now, state.agent_states,
                              state.agent_attrs, state.present,
                              state.npc_target_speed)
    ego_act = jnp.clip(action, ACTION_LOW, ACTION_HIGH)
    acts = npc_act.at[0].set(ego_act)

    # --- kinematic bicycle integration for the whole population
    new_states = bicycle_step(state.agent_states, acts,
                              lr=state.agent_attrs[:, 2], dt=dt,
                              beta_factor=cfg.simulator.bicycle_beta_factor)
    new_states = jnp.where(state.present[:, None], new_states, state.agent_states)

    # --- log-replay override (IAIWrapper replay semantics, gym_env.py:275-294)
    steps = state.step_idx + 1
    rt = suite.replay_states.shape[2]
    r_idx = jnp.minimum(steps, rt - 1)
    replay_now = suite.replay_states[state.case, :, r_idx, :]     # (1+S, 4)
    replay_on = suite.replay_mask[state.case, :, r_idx]           # (1+S,)
    replay_on = replay_on.at[0].set(False)                        # never override ego
    n_fixed = replay_now.shape[0]
    new_states = new_states.at[:n_fixed].set(
        jnp.where(replay_on[:, None], replay_now, new_states[:n_fixed]))

    ego = new_states[0]
    t_new = state.time0 + steps.astype(jnp.float32) * dt

    # --- infractions (exposed-agent = ego, reference gym_env.py:413-417)
    sizes = state.agent_attrs[:, :2]
    offroad = compute_offroad(maps, state.town, ego, sizes[0])
    if cfg.simulator.collision_metric == CollisionMetric.discs:
        collision = ego_collision_discs(new_states, sizes, state.present)
    else:
        collision = ego_collision(new_states, sizes, state.present)
    violation = traffic_light_violation(maps, state.town, t_new, last_ego, ego,
                                        sizes[0])

    # --- waypoint logic + reward (reference gym_env.py:378-411)
    reached = waypoint_reached(ego[:2], suite.waypoints[state.case],
                               state.target_idx, suite.n_waypoints[state.case])
    d_moved = jnp.linalg.norm(ego[:2] - last_ego[:2])
    dist_reward = jnp.where(d_moved > cfg.distance_cutoff, cfg.distance_bonus, 0.0)
    psi_reward = (1.0 - jnp.cos(ego[2] - last_ego[2])) * (-cfg.heading_penalty)
    reach_reward = jnp.where(reached, cfg.waypoint_bonus, 0.0)
    reward = reach_reward + dist_reward + psi_reward

    target_idx = state.target_idx + reached.astype(jnp.int32)
    reached_num = state.reached_num + reached.astype(jnp.int32)

    truncated = steps >= cfg.max_environment_steps
    if cfg.terminated_at_infraction:
        terminated = (offroad > 0) | (collision > 0) | (violation > 0)
    else:
        terminated = jnp.zeros((), bool)

    # info keys/values mirror the reference (gym_env.py:419-437)
    info = dict(
        offroad=offroad,
        collision=collision,
        traffic_light_violation=violation,
        is_success=truncated,
        reached_waypoint_num=reached_num,
        psi_smoothness=jnp.abs((last_ego[2] - ego[2]) / 0.1),
        psi_reward=psi_reward,
        dist_reward=dist_reward,
        speed_smoothness=jnp.abs((last_ego[3] - ego[3]) / 0.1),
    )

    next_state = state.replace(
        agent_states=new_states,
        step_idx=steps,
        target_idx=target_idx,
        reached_num=reached_num,
        npc_hidden=npc_hidden,
    )
    return next_state, reward, terminated, truncated, info
