"""Per-case termination forensics for the validation (or training) suite.

VERDICT.md r2 item 1: the flagship SAC run evaluated at 0% validation
success with no diagnosis. This tool answers *why episodes end*, per
scenario case, for several probe policies:

  sac    the trained checkpoint (deterministic), the actual object of study
  idle   zero accel / zero steer — if this collides, NPC traffic is running
         into a stationary ego (env problem, not policy problem)
  idm    the NPC route-follower driving the ego slot — "can a sane
         lane-follower survive here?" (upper bound on offroad/light safety,
         ignores waypoints)
  chase  a scripted waypoint chaser (P-control steer to target + speed hold) —
         "are the waypoints themselves reachable?"

For every episode it records the first termination cause and a snapshot at
that step (ego pose, SDF depth, nearest-agent gap, current target index), and
aggregates per (case, policy). Output: JSON + human-readable table.

Usage:
    python tools/diagnose_val.py --suite val --episodes 16 \
        --ckpt artifacts/sac_multiagent_ckpt/model_1000000 --out artifacts/diag_val.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env import core
from torchdriveenv_tpu.env.batched import _obs_batched
from torchdriveenv_tpu.maps.arrays import load_assets, sample_sdf
from torchdriveenv_tpu.models.policies import scale_action
from torchdriveenv_tpu.npc.route_follow import npc_actions
from torchdriveenv_tpu.rl.rollout import init_stack, update_stack

CAUSES = ["offroad", "collision", "light", "truncated", "alive"]
# reference README.md:15-27 validation case names (same YAML order)
VAL_NAMES = ["ThreeWay", "Chicken", "ParkedCar", "Roundabout", "TrafficLights"]


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def make_probe(cfg: EnvConfig, assets, policy_kind: str, agent=None,
               agent_state=None, max_steps: int = 200):
    """Returns jitted run(keys, case) -> per-episode diagnostics dict."""
    render = policy_kind == "sac"
    fs = cfg.frame_stack

    def ego_action(state_b, stack):
        if policy_kind == "sac":
            a = agent.select_action(agent_state, stack, jax.random.PRNGKey(0),
                                    deterministic=True)
            return scale_action(a)
        if policy_kind == "idle":
            return jnp.zeros((state_b.step_idx.shape[0], 2))
        if policy_kind == "idm":
            def one(s):
                t = s.time0 + s.step_idx.astype(jnp.float32) * cfg.simulator.dt
                acts = npc_actions(assets.maps, s.town, t, s.agent_states,
                                   s.agent_attrs, s.present, jnp.full(
                                       (s.agent_states.shape[0],), 7.0))
                return jnp.clip(acts[0], core.ACTION_LOW, core.ACTION_HIGH)
            return jax.vmap(one)(state_b)
        if policy_kind == "chase":
            def one(s):
                ego = s.agent_states[0]
                wp = assets.suite.waypoints[s.case][s.target_idx]
                bearing = jnp.arctan2(wp[1] - ego[1], wp[0] - ego[0])
                steer = jnp.clip(2.0 * _wrap(bearing - ego[2]), -0.3, 0.3)
                accel = jnp.clip(0.8 * (6.0 - ego[3]), -1.0, 1.0)
                return jnp.stack([accel, steer])
            return jax.vmap(one)(state_b)
        if policy_kind == "drive":
            # Competent scripted driver — the winnability-ceiling probe.
            # Differences vs "swerve" (whose margins ignored the env's
            # 1 m/s^2 decel cap, reference gym_env.py:83): braking distance
            # v^2/2 + car lengths + buffer, full stop for any blocking
            # obstacle (standoff > collision: success is surviving to
            # truncation), cautious approach to ALL stoplines (the 3 s
            # yellow at <=1 m/s^2 decel has a wide dilemma zone), and a
            # stop at route end instead of driving off the corridor.
            from torchdriveenv_tpu.ops.traffic_lights import (
                LightState,
                light_states_at,
            )

            def one(s):
                maps = assets.maps
                ego = s.agent_states[0]
                pos, psi, v = ego[:2], ego[2], ego[3]
                nw = assets.suite.n_waypoints[s.case]
                tgt = jnp.minimum(s.target_idx, nw - 1)
                wp = assets.suite.waypoints[s.case][tgt]
                done_route = s.target_idx >= nw
                # aim half a lane to the stored-coords LEFT of the waypoint
                # (the traffic convention, npc/route_follow.py): the route
                # polyline is the road center and oncoming NPCs hold the
                # other half
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
                # half-lengths + 5 m buffer (center-to-center distance).
                # ANY agent in the narrow corridor inside stopping distance
                # blocks — tracking only the nearest-ahead lets a passing car
                # in the wide cone mask a parked one dead ahead behind it.
                stop_d = v * v / 2.0 + 12.0
                # cone widens with distance (curved-road visibility, same
                # rationale as npc/route_follow.py emerg_lat) — built from
                # the un-capped forward set, NOT `ahead` (whose 3.2 m lat
                # gate would defeat the widening)
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
                # imminent (cannot stop in time even at full brake): swerve
                # hard away from the nearest blocker WHILE braking — e.g. a
                # spawn 5 m behind a parked car at 4+ m/s (Chicken) is
                # stoppable-distance-doomed but laterally clearable
                lon_n = jnp.where(narrow, lon, jnp.inf)
                jn = jnp.argmin(lon_n)
                imminent = (jnp.isfinite(lon_n[jn])
                            & (lon_n[jn] < v * v / 2.0 + 6.0)
                            & (v > 1.5))
                # swerve only onto pavement: require >=2 m of road on the
                # chosen side (blind full-lock swerves trade collision for
                # offroad)
                sdf_l = sample_sdf(assets.maps, s.town, pos + 3.0 * left)
                sdf_r = sample_sdf(assets.maps, s.town, pos - 3.0 * left)
                away = jnp.where(lat[jn] > 0.0, -1.0, 1.0)
                away_ok = jnp.where(away > 0, sdf_l > 2.0, sdf_r > 2.0)
                other_ok = jnp.where(away > 0, sdf_r > 2.0, sdf_l > 2.0)
                sw = jnp.where(away_ok, away,
                               jnp.where(other_ok, -away, 0.0))
                steer = jnp.where(imminent, 0.3 * sw, steer)
                steer = jnp.where(done_route, 0.0, steer)
                # stoplines: slow near ANY aligned light (green can turn),
                # hard-brake for non-green within stopping distance
                t = s.time0 + s.step_idx.astype(jnp.float32) * cfg.simulator.dt
                sl_mid = (maps.stop_p0[s.town] + maps.stop_p1[s.town]) / 2.0
                rel_sl = sl_mid - pos[None]
                sl_lon = rel_sl @ fwd
                sl_lat = rel_sl @ left
                # lat gate matches the env's violation geometry (stopline
                # half-length 4 + half car width, ops/traffic_lights.py:70)
                # — wider and a cross-street's red line stalls the ego on
                # top of its own green one
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
                # approach-speed cap vs a light that COULD turn: at the
                # 1 m/s^2 decel cap, being able to stop 4 m short of the
                # line requires v^2/2 <= gap-4; the 2 m/s floor keeps
                # rolling (crossing on yellow is legal — 3 s yellow clears
                # a <=6 m gap at 2 m/s)
                green_cap = jnp.clip(
                    jnp.sqrt(2.0 * jnp.maximum(any_gap - 5.0, 0.0)),
                    2.0, 6.0)
                v_tgt = jnp.where(jnp.isfinite(any_gap) & (any_gap < 45.0),
                                  green_cap, 5.0)
                # slow through turns: a sharp corner both hides cross-street
                # stoplines until late and needs lateral-accel margin
                v_tgt = jnp.minimum(
                    v_tgt, jnp.sqrt(3.0 * 6.0 / jnp.maximum(
                        jnp.abs(herr), 0.05)))
                v_tgt = jnp.where(done_route, 0.0, v_tgt)
                can_stop = red_gap >= v * v / 2.0 + 2.0
                nong = jnp.isfinite(red_gap)
                brake_light = nong & (red_gap < v * v / 2.0 + 6.0)
                # too close to stop when it flipped YELLOW: clear the line
                # before red (legal on yellow). On a light that is already
                # RED, never punch — brake as hard as the cap allows.
                clear_past = ~jnp.any(narrow & (lon < red_gap + 14.0)
                                      & (jnp.abs(lat) < 2.5))
                # punch only when the REMAINING yellow outlasts the crossing
                # time — a queue can hold the ego until late in the yellow,
                # and punching then lands the front bumper on a fresh red
                # (the phase countdown is deterministic; a trained policy
                # can infer it from its frame stack)
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
                # brake to a STOP, never through it into reverse (the
                # kinematic bicycle integrates accel through v=0)
                brake_a = jnp.clip(-v / 0.1, -1.0, 1.0)
                # asymmetric gains: the green-light speed-cap curve
                # sqrt(2(gap-5)) decays at exactly the 1 m/s^2 brake cap, so
                # a gain-0.8 tracker lags it by 1.25 m/s and erodes the
                # whole stopping margin — brake with full authority
                cruise = jnp.clip(jnp.where(v > v_tgt, 2.5, 0.8)
                                  * (v_tgt - v), -1.0, 1.0)
                accel = jnp.where(
                    block, brake_a,
                    jnp.where(punch, 1.0,
                              jnp.where(brake_light, brake_a, cruise)))
                return jnp.stack([accel, steer])
            return jax.vmap(one)(state_b)
        if policy_kind == "swerve":
            # chase + obstacle dodge + red-light stop: the scripted
            # approximation of what a trained policy must learn — its
            # success rate is the winnability ceiling probe.
            from torchdriveenv_tpu.npc.route_follow import light_gaps

            def one(s):
                ego = s.agent_states[0]
                pos, psi, v = ego[:2], ego[2], ego[3]
                wp = assets.suite.waypoints[s.case][s.target_idx]
                bearing = jnp.arctan2(wp[1] - pos[1], wp[0] - pos[0])
                steer = jnp.clip(1.5 * _wrap(bearing - psi), -0.3, 0.3)
                fwd = jnp.stack([jnp.cos(psi), jnp.sin(psi)])
                left = jnp.stack([-jnp.sin(psi), jnp.cos(psi)])
                rel = s.agent_states[:, :2] - pos[None]
                lon = rel @ fwd
                lat = rel @ left
                slot = jnp.arange(rel.shape[0])
                ahead = (s.present & (slot != 0) & (lon > 0.0) & (lon < 22.0)
                         & (jnp.abs(lat) < 3.2))
                lon_m = jnp.where(ahead, lon, jnp.inf)
                j = jnp.argmin(lon_m)
                has = jnp.isfinite(lon_m[j])
                # dodge laterally away from the obstacle, harder when close
                dodge = jnp.where(has,
                                  -jnp.sign(lat[j]) * jnp.clip(
                                      (22.0 - lon_m[j]) / 22.0, 0.0, 1.0) * 0.3,
                                  0.0)
                steer = jnp.clip(steer + dodge, -0.3, 0.3)
                # brake for red lights (IDM light gap helper)
                t = s.time0 + s.step_idx.astype(jnp.float32) * cfg.simulator.dt
                lg = light_gaps(assets.maps, s.town, t,
                                s.agent_states[:1], s.agent_attrs[:1])[0]
                stop_d = v * v / 2.0 + 4.0
                brake = (jnp.isfinite(lg) & (lg < stop_d)) | \
                        (has & (lon_m[j] < jnp.maximum(stop_d, 8.0))
                         & (jnp.abs(lat[j]) < 1.8))
                accel = jnp.where(brake, -1.0, jnp.clip(0.8 * (6.0 - v), -1.0, 1.0))
                return jnp.stack([accel, steer])
            return jax.vmap(one)(state_b)
        raise ValueError(policy_kind)

    def run(keys, case):
        e = keys.shape[0]
        state = jax.vmap(lambda k: core.reset(cfg, assets, k, case=case))(keys)
        obs = _obs_batched(cfg, assets, state) if render else \
            jnp.zeros((e, 3, 64, 64), jnp.uint8)
        stack = init_stack(obs, fs)

        def nearest_gap(s):
            ego = s.agent_states[0, :2]
            d = jnp.linalg.norm(s.agent_states[:, :2] - ego[None], axis=-1)
            d = jnp.where(s.present & (jnp.arange(d.shape[0]) != 0), d, jnp.inf)
            j = jnp.argmin(d)
            other = s.agent_states[j]
            rel_psi = _wrap(other[2] - s.agent_states[0, 2])
            return jnp.min(d), j, rel_psi, other[3]

        snap0 = dict(
            cause=jnp.full((e,), 4, jnp.int32),      # alive
            step=jnp.zeros((e,), jnp.int32),
            reached=jnp.zeros((e,), jnp.int32),
            x=jnp.zeros((e,)), y=jnp.zeros((e,)),
            speed=jnp.zeros((e,)),
            sdf=jnp.zeros((e,)),
            gap=jnp.zeros((e,)),
            target=jnp.zeros((e,), jnp.int32),
            near_slot=jnp.zeros((e,), jnp.int32),
            near_relpsi=jnp.zeros((e,)),
            near_speed=jnp.zeros((e,)),
            psi=jnp.zeros((e,)),
        )

        def one(carry, _):
            state, stack, snap, alive = carry
            acts = ego_action(state, stack)
            nstate, reward, term, trunc, info = jax.vmap(
                functools.partial(core.step, cfg, assets))(state, acts)
            done = term | trunc
            newly = alive & done
            cause = jnp.where(info["offroad"] > 0, 0,
                              jnp.where(info["collision"] > 0, 1,
                                        jnp.where(info["traffic_light_violation"] > 0,
                                                  2, 3)))
            ego = nstate.agent_states[:, 0]
            sdf = jax.vmap(lambda s: sample_sdf(
                assets.maps, s.town, s.agent_states[0, :2]))(nstate)
            gap, near_slot, near_relpsi, near_speed = jax.vmap(nearest_gap)(nstate)

            def upd(old, new):
                return jnp.where(newly, new, old)
            snap = dict(
                cause=upd(snap["cause"], cause),
                step=upd(snap["step"], nstate.step_idx),
                reached=upd(snap["reached"], info["reached_waypoint_num"]),
                x=upd(snap["x"], ego[:, 0]), y=upd(snap["y"], ego[:, 1]),
                speed=upd(snap["speed"], ego[:, 3]),
                sdf=upd(snap["sdf"], sdf),
                gap=upd(snap["gap"], gap),
                target=upd(snap["target"], nstate.target_idx),
                near_slot=upd(snap["near_slot"], near_slot),
                near_relpsi=upd(snap["near_relpsi"], near_relpsi),
                near_speed=upd(snap["near_speed"], near_speed),
                psi=upd(snap["psi"], ego[:, 2]),
            )
            if render:
                obs = _obs_batched(cfg, assets, nstate)
                stack = update_stack(stack, obs, done)
            return (nstate, stack, snap, alive & ~done), None

        (state, _, snap, alive), _ = jax.lax.scan(
            one, (state, stack, snap0, jnp.ones((e,), bool)), None,
            length=max_steps)
        # still-alive (no infraction, horizon hit as step cap == max steps)
        snap["reached"] = jnp.where(alive, state.reached_num, snap["reached"])
        return snap

    return jax.jit(run, static_argnums=())


def restore_agent(ckpt_path: str, obs_channels: int):
    import orbax.checkpoint as ocp
    from torchdriveenv_tpu.rl.sac import SAC, SACConfig
    agent = SAC(SACConfig(), obs_channels)
    template = agent.init(jax.random.PRNGKey(0))
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(ckpt_path), item=jax.device_get(template))
    return agent, jax.tree.map(jnp.asarray, restored)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="val")
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--cases", type=int, default=None,
                    help="number of cases to probe (default: all)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--policies", default="idle,idm,chase")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = EnvConfig(ego_only=False, use_background_traffic=True,
                    terminated_at_infraction=True, frame_stack=3,
                    distance_cutoff=0.25)
    assets = load_assets(args.suite)
    n_cases = int(assets.suite.case_town.shape[0])
    if args.cases:
        n_cases = min(n_cases, args.cases)

    policies = args.policies.split(",")
    agent = agent_state = None
    if args.ckpt:
        agent, agent_state = restore_agent(args.ckpt, 3 * cfg.frame_stack)
        if "sac" not in policies:
            policies.append("sac")

    results = {}
    key = jax.random.PRNGKey(args.seed)
    for kind in policies:
        probe = make_probe(cfg, assets, kind, agent, agent_state,
                           max_steps=cfg.max_environment_steps)
        per_case = []
        for c in range(n_cases):
            key, k = jax.random.split(key)
            snap = jax.device_get(probe(jax.random.split(k, args.episodes),
                                        jnp.asarray(c, jnp.int32)))
            causes = np.asarray(snap["cause"])
            row = dict(
                case=c,
                name=(VAL_NAMES[c] if args.suite == "val" and c < 5 else str(c)),
                counts={nm: int((causes == i).sum())
                        for i, nm in enumerate(CAUSES)},
                mean_term_step=float(np.mean(snap["step"][causes < 3]))
                if (causes < 3).any() else None,
                mean_reached=float(np.mean(snap["reached"])),
                detail=[
                    dict(cause=CAUSES[int(causes[j])], step=int(snap["step"][j]),
                         reached=int(snap["reached"][j]),
                         x=round(float(snap["x"][j]), 1),
                         y=round(float(snap["y"][j]), 1),
                         speed=round(float(snap["speed"][j]), 2),
                         sdf=round(float(snap["sdf"][j]), 2),
                         gap=round(float(snap["gap"][j]), 2),
                         target=int(snap["target"][j]),
                         near_slot=int(snap["near_slot"][j]),
                         near_relpsi=round(float(snap["near_relpsi"][j]), 2),
                         near_speed=round(float(snap["near_speed"][j]), 2),
                         psi=round(float(snap["psi"][j]), 2))
                    for j in range(len(causes))],
            )
            per_case.append(row)
            c_str = " ".join(f"{nm}={row['counts'][nm]}" for nm in CAUSES)
            print(f"[{kind:5s}] case {row['name']:<13s} {c_str} "
                  f"reached={row['mean_reached']:.1f}", flush=True)
        results[kind] = per_case

    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
