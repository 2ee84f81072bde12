"""Map-geometry fidelity audit.

The drivable area is *synthesized* from the reference's own bundled data
(waypoint corridors, replay trajectories, agent spawn stubs — see
maps/compile.py and DESIGN.md). This tool quantifies how faithful that
synthesis is to every piece of ground-truth evidence the reference ships:

  1. every waypoint of all 105 cases (reference data/*.yml) must lie on-road
     in the compiled SDF (center test, reference gym_env.py:351-367 spawns
     the ego between waypoints 0 and 1);
  2. every scenario-predefined agent pose (validation_cases.yml) must be
     fully on-road under the env's own corner-based offroad metric
     (ops/offroad.py; reference compute_offroad at gym_env.py:142,415);
  3. every replay pose over time (car_sequence_suite, up to 300 frames) must
     be on-road for the replayed vehicle's footprint;
  4. every background-traffic agent of all 75 caches
     (resources/background_traffic/*.json) must be on-road;
  5. every waypoint must be covered by the analytic road-render segment
     index (seg_data) — the corridor the rasterizer actually draws — so the
     observation shows road wherever the reward says there is road.

Additionally, spawn-segment interpolants (ego spawns uniformly on the
wp0->wp1 segment, reference gym_env.py:352-355) are sampled densely and
checked on-road with the largest ego footprint (length 5.5, width 2.2,
reference gym_env.py:194-196).

Usage: JAX_PLATFORMS=cpu python tools/audit_map_fidelity.py [--json out.json]
Exit code 0 iff all checks pass at 100%.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.maps.arrays import Assets, load_assets, sample_sdf
from torchdriveenv_tpu.ops.collision import obb_corners
from torchdriveenv_tpu.ops.offroad import compute_offroad

EGO_MAX_SIZE = np.array([5.5, 2.2], np.float32)  # reference gym_env.py:194-196


def _off(maps, town, states, sizes):
    """Batched corner-based offroad (ops/offroad.py semantics; the op itself
    takes a scalar town under vmap, so expand town over the corner axis)."""
    corners = obb_corners(jnp.asarray(states), jnp.asarray(sizes))  # (...,4,2)
    town4 = jnp.broadcast_to(jnp.asarray(town)[..., None],
                             corners.shape[:-1])
    sdf = sample_sdf(maps, town4, corners)
    return np.asarray(jnp.maximum(-jnp.min(sdf, axis=-1), 0.0))


def audit_waypoints(assets: Assets, suite_name: str) -> dict:
    s = assets.suite
    mask = np.asarray(s.waypoint_mask)
    towns = np.broadcast_to(np.asarray(s.case_town)[:, None], mask.shape)
    sdf = np.asarray(sample_sdf(assets.maps, jnp.asarray(towns),
                                s.waypoints))
    viol = (sdf <= 0) & mask
    return dict(
        suite=suite_name, n=int(mask.sum()), violations=int(viol.sum()),
        min_sdf_m=float(sdf[mask].min()), mean_sdf_m=float(sdf[mask].mean()),
    )


def audit_spawn_segments(assets: Assets, suite_name: str, k: int = 32) -> dict:
    """Ego spawn = uniform on segment wp0->wp1 (reference gym_env.py:352-355);
    heading from the direction field. Check the largest ego footprint stays
    on-road along k interpolants of every case's spawn segment."""
    from torchdriveenv_tpu.maps.arrays import sample_dir_angle
    s = assets.suite
    wp = np.asarray(s.waypoints)
    t = np.linspace(0.0, 1.0, k, dtype=np.float32)[None, :, None]
    pts = wp[:, None, 0] * (1 - t) + wp[:, None, 1] * t        # (C, k, 2)
    towns = np.broadcast_to(np.asarray(s.case_town)[:, None], pts.shape[:2])
    psi = np.asarray(sample_dir_angle(assets.maps, jnp.asarray(towns),
                                      jnp.asarray(pts)))
    states = np.concatenate([pts, psi[..., None],
                             np.zeros_like(psi)[..., None]], -1)
    sizes = np.broadcast_to(EGO_MAX_SIZE, pts.shape[:2] + (2,))
    off = _off(assets.maps, towns, states, sizes)
    return dict(suite=suite_name, n=int(off.size),
                violations=int((off > 0).sum()),
                max_offroad_m=float(off.max()))


def audit_scenario_agents(assets: Assets, suite_name: str) -> dict:
    s = assets.suite
    mask = np.asarray(s.scen_mask)
    if not mask.any():
        return dict(suite=suite_name, n=0, violations=0, max_offroad_m=0.0)
    towns = np.broadcast_to(np.asarray(s.case_town)[:, None], mask.shape)
    off = _off(assets.maps, towns, np.asarray(s.scen_states),
               np.asarray(s.scen_attrs)[..., :2])
    off = np.where(mask, off, 0.0)
    return dict(suite=suite_name, n=int(mask.sum()),
                violations=int(((off > 0) & mask).sum()),
                max_offroad_m=float(off.max()))


def audit_replay_poses(assets: Assets, suite_name: str) -> dict:
    s = assets.suite
    mask = np.asarray(s.replay_mask)                    # (C, 1+S, T)
    if not mask.any():
        return dict(suite=suite_name, n=0, violations=0, max_offroad_m=0.0)
    states = np.asarray(s.replay_states)                # (C, 1+S, T, 4)
    # slot 0 = ego replay (largest ego footprint); slots 1..S use the
    # scenario agent attrs (merged agent order, reference gym_env.py:279)
    attrs = np.asarray(s.scen_attrs)[..., :2]           # (C, S, 2)
    c, a, t = mask.shape
    sizes = np.concatenate(
        [np.broadcast_to(EGO_MAX_SIZE, (c, 1, 2)), attrs], axis=1)
    # masked-out slots may have zero attrs; give them the ego footprint so a
    # stray unmasked pose is caught rather than trivially passing at size 0
    sizes = np.where(sizes.max(-1, keepdims=True) > 0, sizes, EGO_MAX_SIZE)
    towns = np.broadcast_to(np.asarray(s.case_town)[:, None, None], mask.shape)
    off = _off(assets.maps, towns, states,
               np.broadcast_to(sizes[:, :, None], mask.shape + (2,)))
    return dict(suite=suite_name, n=int(mask.sum()),
                violations=int(((off > 0) & mask).sum()),
                max_offroad_m=float(np.where(mask, off, 0.0).max()))


def audit_background(assets: Assets) -> dict:
    b = assets.background
    mask = np.asarray(b.bg_mask)                        # (T, F, A)
    towns = np.broadcast_to(
        np.arange(mask.shape[0], dtype=np.int32)[:, None, None], mask.shape)
    off = _off(assets.maps, towns, np.asarray(b.bg_states),
               np.asarray(b.bg_attrs)[..., :2])
    off = np.where(mask, off, 0.0)
    return dict(suite="background", n=int(mask.sum()),
                violations=int(((off > 0) & mask).sum()),
                max_offroad_m=float(off.max()))


def audit_render_coverage(assets: Assets, suite_name: str) -> dict:
    """Every waypoint must be drawable by the analytic road-render index:
    some segment stored in the waypoint's coarse cell covers it."""
    m = assets.maps
    s = assets.suite
    seg_data = np.asarray(m.seg_data)                  # (T, C, C, K, 8)
    cell = float(np.asarray(m.seg_cell))
    origin = np.asarray(m.origin)
    wp = np.asarray(s.waypoints)
    mask = np.asarray(s.waypoint_mask)
    towns = np.asarray(s.case_town)
    n_cells = seg_data.shape[1]
    viol = 0
    worst = 0.0
    for c in range(wp.shape[0]):
        t = int(towns[c])
        for w in range(wp.shape[1]):
            if not mask[c, w]:
                continue
            p = wp[c, w]
            ij = np.clip(((p - origin[t]) / cell).astype(int), 0, n_cells - 1)
            rows = seg_data[t, ij[0], ij[1]]           # (K, 8)
            p0, p1, shw2 = rows[:, 0:2], rows[:, 2:4], rows[:, 4]
            seg = p1 - p0
            len2 = np.maximum((seg * seg).sum(-1), 1e-9)
            tt = np.clip(((p - p0) * seg).sum(-1) / len2, 0.0, 1.0)
            d2 = ((p - (p0 + tt[:, None] * seg)) ** 2).sum(-1)
            covered = (d2 <= shw2) & (shw2 > 0)
            if not covered.any():
                viol += 1
                worst = max(worst, float(np.sqrt(
                    np.maximum(d2 - np.maximum(shw2, 0.0), 0.0).min())))
    return dict(suite=suite_name, n=int(mask.sum()), violations=viol,
                uncovered_worst_gap_m=worst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    results = []
    for suite_name in ("train", "val"):
        assets = load_assets(suite_name)
        results.append(("waypoints_on_road",
                        audit_waypoints(assets, suite_name)))
        results.append(("spawn_segment_on_road",
                        audit_spawn_segments(assets, suite_name)))
        results.append(("scenario_agents_on_road",
                        audit_scenario_agents(assets, suite_name)))
        results.append(("replay_poses_on_road",
                        audit_replay_poses(assets, suite_name)))
        results.append(("render_index_covers_waypoints",
                        audit_render_coverage(assets, suite_name)))
    results.append(("background_agents_on_road", audit_background(assets)))

    total_viol = 0
    report = []
    for name, r in results:
        ok = r["violations"] == 0
        total_viol += r["violations"]
        line = {"check": name, **r, "ok": ok}
        report.append(line)
        print(json.dumps(line))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(f"TOTAL violations: {total_viol}")
    sys.exit(0 if total_viol == 0 else 1)


if __name__ == "__main__":
    main()
