"""Offline asset compilation: scenario suites + traffic caches + map
geometry -> fixed-shape padded numpy bundles consumed by the jitted engine.

TPU-native replacement for the reference's runtime data loading stack
(reference: torchdriveenv/env_utils.py, gym_env.py:200-217 background traffic
sampling, torchdrivesim's find_map_config/lanelet2 map loading at
gym_env.py:312). See tools/compile_assets.py for the CLI and DESIGN.md for
the map-synthesis rationale (CARLA meshes are not available; drivable area is
synthesized conservatively from the bundled data itself, and the schema
accepts real map rasters whenever available).
"""

import json
import math
import os
import sys

import numpy as np
import yaml

try:
    from scipy import ndimage
except ImportError:  # pragma: no cover
    ndimage = None

from torchdriveenv_tpu.maps import native

TOWNS = ["Town01", "Town02", "Town03", "Town07", "Town10HD"]
GRID = 1024            # pixels per side
SCALE = 0.5            # meters per pixel
MARGIN = 24.0          # meters of padding around content bounds
# Corridor half widths. Waypoint polylines trace the ego's LANE CENTER, but
# the reference's drivable surface is the whole road mesh (both directions +
# shoulder): torchdrivesim's compute_offroad only fires when the agent leaves
# the paved surface entirely. The validation suite *requires* leaving the lane
# (ParkedCar/Chicken are dodge maneuvers), so the corridor must cover the full
# road: lane half (1.75) + opposing lane (3.5) + shoulder ~= 6 m.
# (r2 used 3.5 m, which made those cases unwinnable — every dodge was offroad;
# see artifacts/diag_val_probes.json and DESIGN.md "validation diagnosis".)
#
# r5 calibration (VERDICT r4 weak #6): a UNIFORM 6 m is over-generous on
# narrow/one-way roads — an ego two lanes off the center could be "on-road"
# here and offroad in the reference. Per-segment halfwidths are now
# calibrated from the traffic evidence the reference ships (background-cache
# agent poses, scenario agents, replay frames, and the other routes' lane
# centerlines): hw = clip(max lateral evidence + its half-width +
# PASS_MARGIN, HW_MIN, HW_MAX). Roads with observed opposing/adjacent
# traffic keep the full 6 m; roads whose only evidence is the ego lane
# shrink to the 4.5 m dodge floor. Containment of every reference-evidence
# pose is preserved by construction (margin > footprint half-diagonal) and
# re-proven by tools/audit_map_fidelity.py.
WAYPOINT_HALFWIDTH = 6.0   # max corridor half width (two-way road) (m)
HW_MIN = 4.5               # dodge floor: lane + obstacle-passing clearance (m)
PASS_MARGIN = 2.5          # clearance beyond an evidence pose's center (m)
EVIDENCE_LON_SLACK = 3.0   # longitudinal reach of evidence past segment ends (m)
EVIDENCE_LAT_CAP = 6.5     # evidence farther than this is another road (m)
ENDCAP_EXTENSION = 30.0    # corridor continuation beyond the ROUTE END (m)
# the spawn end only needs a short overshoot guard (the ego spawns on
# wp0->wp1 heading along the lane; it never travels far backwards) — a full
# 30 m back-extension stamps phantom pavement at T-junction route starts
# (r4 advisor finding)
SPAWN_END_EXTENSION = 10.0
STUB_HALFWIDTH = 4.5       # half width around background-agent heading stubs (m)
STUB_LENGTH = 7.0          # background agent stub extent along heading (m)
MAX_AGENTS = 96        # padded agent capacity (reference keeps scenes <100 agents, gym_env.py:216)
MAX_WAYPOINTS = 20     # training cases have 5..20 waypoints
MAX_SCEN_AGENTS = 4    # validation max is 2 predefined agents
MAX_REPLAY_T = 304     # validation max replay length is 300
MAX_BG_FILES = 20      # Town02/Town03 have 20 cached traffic files
MAX_LIGHTS = 16        # synthesized traffic lights per town
MAX_SEGMENTS = 1536    # padded corridor segments per town (max observed 1031)
SEG_CELL = 32.0        # coarse segment-index cell size (m)
SEG_GRID = int(GRID * SCALE / SEG_CELL)   # 16x16 cells over the town extent
SEG_K = 320            # max segments per coarse cell (max observed 292 at 6 m halfwidth)
SEG_REACH = 80.0       # cell half-diag + obs window half-diag + halfwidth (m)
SEG_F = 8              # fields per segment row: p0x p0y p1x p1y shw2 pad pad pad
LIGHT_GREEN, LIGHT_YELLOW, LIGHT_RED = 10.0, 3.0, 7.0   # cycle durations (s)
STOPLINE_SETBACK = 10.0    # stopline distance before the intersection point (m)
STOPLINE_HALFWIDTH = 4.0   # stopline segment half length (m)


def log(*a):
    print("[compile_assets]", *a, file=sys.stderr)


# ---------------------------------------------------------------------------
# geometry helpers (host-side, numpy)
# ---------------------------------------------------------------------------

def stamp_segment(drivable, dir_best_d, dir_angle, p0, p1, halfwidth, origin, scale):
    """Mark pixels within `halfwidth` of segment p0-p1 as drivable and record
    the segment direction for the closest segment per pixel."""
    g = drivable.shape[0]
    seg = np.asarray(p1, np.float64) - np.asarray(p0, np.float64)
    seg_len = float(np.hypot(*seg))
    ang = math.atan2(seg[1], seg[0]) if seg_len > 1e-6 else None
    lo = np.minimum(p0, p1) - halfwidth
    hi = np.maximum(p0, p1) + halfwidth
    i0 = max(int((lo[0] - origin[0]) / scale) - 1, 0)
    j0 = max(int((lo[1] - origin[1]) / scale) - 1, 0)
    i1 = min(int((hi[0] - origin[0]) / scale) + 2, g)
    j1 = min(int((hi[1] - origin[1]) / scale) + 2, g)
    if i0 >= i1 or j0 >= j1:
        return
    xs = origin[0] + (np.arange(i0, i1) + 0.5) * scale
    ys = origin[1] + (np.arange(j0, j1) + 0.5) * scale
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    px = X - p0[0]
    py = Y - p0[1]
    if seg_len > 1e-6:
        t = np.clip((px * seg[0] + py * seg[1]) / (seg_len * seg_len), 0.0, 1.0)
    else:
        t = 0.0
    dx = px - t * seg[0]
    dy = py - t * seg[1]
    d = np.hypot(dx, dy)
    inside = d <= halfwidth
    drivable[i0:i1, j0:j1] |= inside
    if ang is not None:
        win_d = dir_best_d[i0:i1, j0:j1]
        closer = d < win_d
        win_d[closer] = d[closer]
        dir_angle[i0:i1, j0:j1][closer] = ang


def calibrate_widths(arr, evidence):
    """Per-segment corridor halfwidths from traffic evidence (see the
    constants block above). `arr` (N, 2) route polyline; `evidence` (M, 3)
    rows [x, y, footprint_halfwidth]. Returns (N-1,) halfwidths in
    [HW_MIN, WAYPOINT_HALFWIDTH]."""
    n_seg = len(arr) - 1
    hws = np.full(max(n_seg, 0), HW_MIN)
    if n_seg <= 0 or len(evidence) == 0:
        return hws
    E = np.asarray(evidence, np.float64)
    pts, ehw = E[:, :2], E[:, 2]
    for k in range(n_seg):
        p0, p1 = arr[k], arr[k + 1]
        seg = p1 - p0
        L = float(np.hypot(*seg))
        if L < 1e-6:
            continue
        d = seg / L
        rel = pts - p0
        lon = rel @ d
        lat = np.abs(rel @ np.array([-d[1], d[0]]))
        m = ((lon > -EVIDENCE_LON_SLACK) & (lon < L + EVIDENCE_LON_SLACK)
             & (lat < EVIDENCE_LAT_CAP))
        if m.any():
            need = float((lat[m] + ehw[m]).max()) + PASS_MARGIN
            hws[k] = np.clip(need, HW_MIN, WAYPOINT_HALFWIDTH)
    return hws


def simplify_polyline(pts, eps=0.4, return_idx=False):
    """Douglas-Peucker. pts (N, 2) -> subset keeping max deviation <= eps.
    Used to compact the *render* segment set (corridor coverage changes by
    <= eps, well under the corridor halfwidth); the SDF grid is always
    rasterized from the full-resolution segments. `return_idx` additionally
    returns the kept original indices (for mapping per-segment widths onto
    the simplified spans)."""
    pts = np.asarray(pts, np.float64)
    n = len(pts)
    if n <= 2:
        return (pts, np.arange(n)) if return_idx else pts
    keep = np.zeros(n, bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = pts[i1] - pts[i0]
        len2 = float(seg @ seg)
        rel = pts[i0 + 1:i1] - pts[i0]
        if len2 < 1e-12:
            d = np.linalg.norm(rel, axis=-1)
        else:
            t = np.clip((rel @ seg) / len2, 0.0, 1.0)
            d = np.linalg.norm(rel - t[:, None] * seg[None], axis=-1)
        k = int(np.argmax(d))
        if d[k] > eps:
            km = i0 + 1 + k
            keep[km] = True
            stack.append((i0, km))
            stack.append((km, i1))
    if return_idx:
        return pts[keep], np.nonzero(keep)[0]
    return pts[keep]


def seg_intersect(a0, a1, b0, b1):
    """Return intersection point of segments or None."""
    r = a1 - a0
    s = b1 - b0
    denom = r[0] * s[1] - r[1] * s[0]
    if abs(denom) < 1e-9:
        return None
    q = b0 - a0
    t = (q[0] * s[1] - q[1] * s[0]) / denom
    u = (q[0] * r[1] - q[1] * r[0]) / denom
    if 0.0 <= t <= 1.0 and 0.0 <= u <= 1.0:
        return a0 + t * r
    return None


# ---------------------------------------------------------------------------
# loading reference data (as *data inputs*, not code)
# ---------------------------------------------------------------------------

def load_suites(ref):
    data_dir = os.path.join(ref, "torchdriveenv", "data")
    suites = {}
    for name, fn in [("train", "training_cases.yml"), ("val", "validation_cases.yml")]:
        with open(os.path.join(data_dir, fn)) as f:
            suites[name] = yaml.safe_load(f)
    return suites


def load_background(ref):
    bg_dir = os.path.join(ref, "torchdriveenv", "resources", "background_traffic")
    per_town = {t: [] for t in TOWNS}
    for fn in sorted(os.listdir(bg_dir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(bg_dir, fn)) as f:
            j = json.load(f)
        town = j["location"].split(":")[-1]
        per_town[town].append(j)
    return per_town


# ---------------------------------------------------------------------------
# compilation passes
# ---------------------------------------------------------------------------

def town_evidence(suites, background, town):
    """All reference-data poses evidencing drivable pavement in this town:
    rows [x, y, footprint_halfwidth]. Used to calibrate per-segment corridor
    widths (calibrate_widths)."""
    rows = []
    for suite in suites.values():
        scen_list = suite.get("scenarios") or [None] * len(suite["locations"])
        for loc, wps, cseq, sc in zip(
                suite["locations"], suite["waypoint_suite"],
                suite["car_sequence_suite"], scen_list):
            if loc != town:
                continue
            for x, y in np.asarray(wps, np.float64):
                rows.append((x, y, 0.0))       # lane centerline sample
            for seq in (cseq or {}).values():
                for fr in np.asarray(seq, np.float64):
                    rows.append((fr[0], fr[1], 1.1))
            if sc is not None:
                for st, at in zip(sc["agent_states"],
                                  sc["agent_attributes"]):
                    rows.append((st[0], st[1], at[1] / 2.0))
    for j in background.get(town, []):
        for st, at in zip(j["agent_states"], j["agent_attributes"]):
            rows.append((st["center"]["x"], st["center"]["y"],
                         at["width"] / 2.0))
    return np.asarray(rows, np.float64).reshape(-1, 3)


def town_content(suites, background, town):
    """All polyline segments + agent stubs that evidence drivable area.

    Returns (segments, points, render_segments): `segments` at full polyline
    resolution (rasterized into the SDF grid), `render_segments` the
    Douglas-Peucker-simplified set used by the analytic road-render index.
    Route/replay corridors carry evidence-calibrated per-segment halfwidths
    (calibrate_widths)."""
    segments = []          # (p0, p1, halfwidth)
    render_segments = []
    points = []
    evidence = town_evidence(suites, background, town)

    def add_polyline(arr, hw=None, start_ext=SPAWN_END_EXTENSION,
                     end_ext=ENDCAP_EXTENSION):
        # Roads continue past a route's endpoints: the reference's drivable
        # surface is the whole CARLA road mesh, so an agent driving on past
        # the final waypoint is still on pavement. Extend the end segments
        # outward so the synthesized corridor doesn't end in a cliff exactly
        # where a finished route stops (r3 probes clustered offroad ~6 m past
        # ThreeWay's last waypoint, artifacts/diag_r3d.json). Extensions
        # inherit the calibrated width of their end segment; the spawn end
        # gets only a short overshoot guard (SPAWN_END_EXTENSION).
        arr = np.asarray(arr, np.float64)
        if len(arr) < 2:
            return
        hws = (calibrate_widths(arr, evidence) if hw is None
               else np.full(len(arr) - 1, float(hw)))
        d0 = arr[0] - arr[1]
        n0 = np.hypot(*d0)
        d1 = arr[-1] - arr[-2]
        n1 = np.hypot(*d1)
        ext, ehws = [], []
        if n0 > 0.2 and start_ext > 0:
            ext.append((arr[0] + start_ext * d0 / n0)[None])
            ehws.append([hws[0]])
        ext.append(arr)
        ehws.append(hws)
        if n1 > 0.2 and end_ext > 0:
            ext.append((arr[-1] + end_ext * d1 / n1)[None])
            ehws.append([hws[-1]])
        arr = np.concatenate(ext, axis=0)
        hws = np.concatenate(ehws)
        # keep the grid's content bounds covering the extensions
        points.extend([arr[0].tolist(), arr[-1].tolist()])
        for k in range(len(arr) - 1):
            if np.hypot(*(arr[k + 1] - arr[k])) > 0.2:
                segments.append((arr[k], arr[k + 1], hws[k]))
        simp, idx = simplify_polyline(arr, return_idx=True)
        for k in range(len(simp) - 1):
            # a simplified span covers original segments idx[k]..idx[k+1]-1;
            # take their max width so containment cannot shrink
            shw = float(hws[idx[k]:idx[k + 1]].max())
            render_segments.append((simp[k], simp[k + 1], shw))

    for suite in suites.values():
        for loc, wps, cseq in zip(
            suite["locations"], suite["waypoint_suite"], suite["car_sequence_suite"]
        ):
            if loc != town:
                continue
            wps = np.asarray(wps, np.float64)
            points.extend(wps.tolist())
            add_polyline(wps)
            for seq in (cseq or {}).values():
                arr = np.asarray(seq, np.float64)
                points.extend(arr[:, :2].tolist())
                add_polyline(arr[:, :2], start_ext=ENDCAP_EXTENSION)
        for sc in suite.get("scenarios") or []:
            if sc is None:
                continue
            # scenario agents also evidence drivable space at their spawn
            for st in sc["agent_states"]:
                # only include if this scenario belongs to the town — handled below
                pass
    # scenario agent stubs (need the per-case town)
    for suite in suites.values():
        scen = suite.get("scenarios")
        if not scen:
            continue
        for loc, sc in zip(suite["locations"], scen):
            if loc != town or sc is None:
                continue
            for x, y, psi, _spd in sc["agent_states"]:
                d = np.array([math.cos(psi), math.sin(psi)])
                c = np.array([x, y])
                stub = (c - STUB_LENGTH * d, c + STUB_LENGTH * d, STUB_HALFWIDTH)
                segments.append(stub)
                render_segments.append(stub)
                points.append([x, y])
    for j in background.get(town, []):
        for st in j["agent_states"]:
            x, y = st["center"]["x"], st["center"]["y"]
            psi = st["orientation"]
            d = np.array([math.cos(psi), math.sin(psi)])
            c = np.array([x, y])
            stub = (c - STUB_LENGTH * d, c + STUB_LENGTH * d, STUB_HALFWIDTH)
            segments.append(stub)
            render_segments.append(stub)
            points.append([x, y])
    return segments, np.asarray(points, np.float64), render_segments


def compile_town_map(segments, points):
    lo = points.min(axis=0) - MARGIN
    hi = points.max(axis=0) + MARGIN
    center = (lo + hi) / 2.0
    extent = GRID * SCALE
    origin = center - extent / 2.0
    if np.any(hi - lo > extent):
        log(f"WARNING: content extent {hi - lo} exceeds grid extent {extent}")

    if native.available():
        return compile_town_map_native(segments, origin)

    drivable = np.zeros((GRID, GRID), dtype=bool)
    dir_best_d = np.full((GRID, GRID), 1e9, dtype=np.float64)
    dir_angle = np.zeros((GRID, GRID), dtype=np.float64)
    for p0, p1, hw in segments:
        stamp_segment(drivable, dir_best_d, dir_angle, np.asarray(p0), np.asarray(p1), hw, origin, SCALE)

    # signed distance (meters), positive inside drivable area
    if ndimage is None:
        raise RuntimeError("scipy required for asset compilation")
    inside = ndimage.distance_transform_edt(drivable) * SCALE
    outside = ndimage.distance_transform_edt(~drivable) * SCALE
    sdf = (inside - outside).astype(np.float32)

    # propagate direction field to every pixel from nearest covered pixel
    covered = dir_best_d < 1e8
    _, idx = ndimage.distance_transform_edt(~covered, return_indices=True)
    dir_full = dir_angle[idx[0], idx[1]]
    return origin.astype(np.float32), sdf, dir_full.astype(np.float32)


def compile_segment_index(segments, origin):
    """Corridor segments + a coarse per-cell segment-DATA index for the
    analytic road-rendering path: the rasterizer (ops/rasterizer_pallas.py)
    tests every pixel against the corridor segments near the ego instead of
    gathering from the SDF grid — a zero-gather, pure-VPU formulation.

    Returns dict with:
      seg_data (SEG_GRID, SEG_GRID, SEG_K, SEG_F) float32: for every coarse
        cell, the segments whose corridor can reach an observation window
        centered anywhere in the cell, sorted nearest-to-cell-center first,
        rows [p0x, p0y, p1x, p1y, shw2, 0, 0, 0] where shw2 = sign(hw)*hw^2
        (-1 sentinel rows never cover a pixel);
      seg_cell_n (SEG_GRID, SEG_GRID) int32 counts (for block skipping).
    """
    # dedup near-identical segments (background stubs repeat the same lanes
    # across the ~20 cached traffic files). Stubs (identified by their fixed
    # length/halfwidth) get a coarser 4 m / 30 deg bin — their corridors are
    # 6 m wide, so merged stubs still cover the same pavement.
    seen, uniq = set(), []
    for s in segments:
        p0, p1, hw = np.asarray(s[0]), np.asarray(s[1]), s[2]
        is_stub = abs(hw - STUB_HALFWIDTH) < 1e-6 and \
            abs(np.hypot(*(p1 - p0)) - 2 * STUB_LENGTH) < 1e-3
        if is_stub:
            mid = (p0 + p1) / 2.0
            ang = math.atan2(*(p1 - p0)[::-1]) % math.pi   # undirected
            key = ("stub", round(mid[0] / 4), round(mid[1] / 4),
                   round(ang / math.radians(30)))
            if key in seen:
                continue
            seen.add(key)
        else:
            a = (round(p0[0] / 2), round(p0[1] / 2),
                 round(p1[0] / 2), round(p1[1] / 2), round(hw, 1))
            b = (a[2], a[3], a[0], a[1], a[4])
            if a in seen or b in seen:
                continue
            seen.add(a)
        uniq.append(s)
    segments = uniq

    n = len(segments)
    p0 = np.asarray([s[0] for s in segments], np.float32).reshape(n, 2)
    p1 = np.asarray([s[1] for s in segments], np.float32).reshape(n, 2)
    hw = np.asarray([s[2] for s in segments], np.float32)

    # distance from every coarse-cell center to every segment
    cc = origin[None, :] + SEG_CELL * (
        np.stack(np.meshgrid(np.arange(SEG_GRID), np.arange(SEG_GRID),
                             indexing="ij"), -1).reshape(-1, 2) + 0.5)
    seg = p1 - p0
    len2 = np.maximum((seg * seg).sum(-1), 1e-9)
    t = np.clip(((cc[:, None, :] - p0[None]) * seg[None]).sum(-1) / len2,
                0.0, 1.0)
    proj = p0[None] + t[..., None] * seg[None]
    d = np.linalg.norm(cc[:, None, :] - proj, axis=-1)      # (cells, n)

    data = np.zeros((SEG_GRID * SEG_GRID, SEG_K, SEG_F), np.float32)
    data[:, :, 4] = -1.0                                    # sentinel shw2
    counts = np.zeros((SEG_GRID * SEG_GRID,), np.int32)
    truncated = 0
    for c in range(SEG_GRID * SEG_GRID):
        near = np.where(d[c] < SEG_REACH + hw)[0]
        near = near[np.argsort(d[c][near], kind="stable")]
        if len(near) > SEG_K:
            truncated += len(near) - SEG_K
            near = near[:SEG_K]
        counts[c] = len(near)
        data[c, : len(near), 0:2] = p0[near]
        data[c, : len(near), 2:4] = p1[near]
        data[c, : len(near), 4] = hw[near] ** 2
    if truncated:
        log(f"WARNING: seg index truncated {truncated} segment entries")
    return dict(
        seg_data=data.reshape(SEG_GRID, SEG_GRID, SEG_K, SEG_F),
        seg_cell_n=counts.reshape(SEG_GRID, SEG_GRID),
    ), int(counts.max())


def compile_town_map_native(segments, origin):
    """Grid passes on the C++ kernels (csrc/mapkit.cpp via maps/native.py)."""
    drivable = np.zeros((GRID, GRID), dtype=np.uint8)
    dir_best_d = np.full((GRID, GRID), 1e9, dtype=np.float32)
    dir_angle = np.zeros((GRID, GRID), dtype=np.float32)
    p0 = np.asarray([s[0] for s in segments], np.float64).reshape(-1, 2)
    p1 = np.asarray([s[1] for s in segments], np.float64).reshape(-1, 2)
    hw = np.asarray([s[2] for s in segments], np.float64)
    native.stamp_segments(GRID, origin, SCALE, p0, p1, hw,
                          drivable, dir_best_d, dir_angle)
    sdf = native.sdf(drivable, SCALE)
    covered = (dir_best_d < 1e8).astype(np.uint8)
    dir_full = native.propagate_dir(covered, dir_angle)
    return origin.astype(np.float32), sdf, dir_full


def synthesize_lights(suites, town):
    """Place traffic lights at corridor crossings: intersections between
    waypoint segments of *different* cases meeting at >45 deg, clustered."""
    segs = []
    for suite in suites.values():
        for ci, (loc, wps) in enumerate(zip(suite["locations"], suite["waypoint_suite"])):
            if loc != town:
                continue
            wps = np.asarray(wps, np.float64)
            for k in range(len(wps) - 1):
                segs.append((id(suite) * 1000 + ci, wps[k], wps[k + 1]))
    hits = []
    for i in range(len(segs)):
        for j in range(i + 1, len(segs)):
            ci, a0, a1 = segs[i]
            cj, b0, b1 = segs[j]
            if ci == cj:
                continue
            da = a1 - a0
            db = b1 - b0
            na, nb = np.hypot(*da), np.hypot(*db)
            if na < 1e-6 or nb < 1e-6:
                continue
            cosang = abs(np.dot(da, db) / (na * nb))
            if cosang > math.cos(math.radians(45)):
                continue
            p = seg_intersect(a0, a1, b0, b1)
            if p is not None:
                hits.append((p, math.atan2(da[1], da[0]), math.atan2(db[1], db[0])))
    # second source of intersection evidence: sharp turns inside a route
    # (a >40 deg heading change at an interior waypoint marks a junction)
    for suite in suites.values():
        for loc, wps in zip(suite["locations"], suite["waypoint_suite"]):
            if loc != town:
                continue
            wps = np.asarray(wps, np.float64)
            for k in range(1, len(wps) - 1):
                din = wps[k] - wps[k - 1]
                dout = wps[k + 1] - wps[k]
                if np.hypot(*din) < 1e-6 or np.hypot(*dout) < 1e-6:
                    continue
                a_in = math.atan2(din[1], din[0])
                a_out = math.atan2(dout[1], dout[0])
                turn = (a_out - a_in + math.pi) % (2 * math.pi) - math.pi
                if abs(turn) > math.radians(40):
                    hits.append((wps[k], a_in, a_out))
    # cluster intersection points within 15 m
    clusters = []
    for p, ang_a, ang_b in hits:
        for c in clusters:
            if np.hypot(*(p - c["p"])) < 15.0:
                c["angles"].update(
                    {round(ang_a / (math.pi / 2)) % 4, round(ang_b / (math.pi / 2)) % 4}
                )
                break
        else:
            clusters.append({"p": p, "angles": {round(ang_a / (math.pi / 2)) % 4,
                                                round(ang_b / (math.pi / 2)) % 4}, "raw": (ang_a, ang_b)})
    # spawn-safe zone: the ego spawns uniformly on each case's wp0->wp1
    # segment (reference gym_env.py:357) with speed up to 10 m/s — a stopline
    # placed on/near a spawn segment forces unavoidable violations at episode
    # start (the CARLA maps never signalize the curated spawn straights).
    spawn_segs = []
    for suite in suites.values():
        for loc, wps in zip(suite["locations"], suite["waypoint_suite"]):
            if loc == town and len(wps) >= 2:
                spawn_segs.append((np.asarray(wps[0], np.float64),
                                   np.asarray(wps[1], np.float64)))

    def near_spawn(p, margin=18.0):
        for a0, a1 in spawn_segs:
            seg = a1 - a0
            len2 = float(seg @ seg)
            t = np.clip(((p - a0) @ seg) / max(len2, 1e-9), 0.0, 1.0)
            if np.hypot(*(p - (a0 + t * seg))) < margin:
                return True
        return False

    p0s, p1s, dirs, phases = [], [], [], []
    for ck, c in enumerate(clusters):
        if len(p0s) >= MAX_LIGHTS:
            break
        ang_a, ang_b = c["raw"]
        for appr_i, appr in enumerate((ang_a, ang_b)):
            if len(p0s) >= MAX_LIGHTS:
                break
            d = np.array([math.cos(appr), math.sin(appr)])
            n = np.array([-d[1], d[0]])
            center = c["p"] - STOPLINE_SETBACK * d
            if near_spawn(center):
                continue
            p0s.append(center - STOPLINE_HALFWIDTH * n)
            p1s.append(center + STOPLINE_HALFWIDTH * n)
            dirs.append(appr)
            # opposing approaches share green; perpendicular offset by half period
            period = LIGHT_GREEN + LIGHT_YELLOW + LIGHT_RED
            phases.append(0.0 if appr_i == 0 else period / 2.0)
    n = len(p0s)
    out = dict(
        stop_p0=np.zeros((MAX_LIGHTS, 2), np.float32),
        stop_p1=np.zeros((MAX_LIGHTS, 2), np.float32),
        stop_dir=np.zeros((MAX_LIGHTS,), np.float32),
        light_phase=np.zeros((MAX_LIGHTS,), np.float32),
        light_mask=np.zeros((MAX_LIGHTS,), bool),
    )
    if n:
        out["stop_p0"][:n] = np.asarray(p0s, np.float32)
        out["stop_p1"][:n] = np.asarray(p1s, np.float32)
        out["stop_dir"][:n] = np.asarray(dirs, np.float32)
        out["light_phase"][:n] = np.asarray(phases, np.float32)
        out["light_mask"][:n] = True
    return out, n


def compile_suite(suite):
    """Padded per-case arrays (reference schema: gym_env.py:56-68 + env_utils.py)."""
    C = len(suite["locations"])
    out = dict(
        case_town=np.zeros((C,), np.int32),
        waypoints=np.zeros((C, MAX_WAYPOINTS, 2), np.float32),
        waypoint_mask=np.zeros((C, MAX_WAYPOINTS), bool),
        n_waypoints=np.zeros((C,), np.int32),
        scen_states=np.zeros((C, MAX_SCEN_AGENTS, 4), np.float32),
        scen_attrs=np.zeros((C, MAX_SCEN_AGENTS, 3), np.float32),
        scen_mask=np.zeros((C, MAX_SCEN_AGENTS), bool),
        replay_states=np.zeros((C, 1 + MAX_SCEN_AGENTS, MAX_REPLAY_T, 4), np.float32),
        replay_mask=np.zeros((C, 1 + MAX_SCEN_AGENTS, MAX_REPLAY_T), bool),
    )
    scen_list = suite.get("scenarios") or [None] * C
    cseq_list = suite.get("car_sequence_suite") or [None] * C
    for c in range(C):
        out["case_town"][c] = TOWNS.index(suite["locations"][c])
        wps = np.asarray(suite["waypoint_suite"][c], np.float32)
        n = len(wps)
        out["waypoints"][c, :n] = wps
        # reference masks out waypoint 0 as a goal (gym_env.py:256); target
        # indexing starts at 1 (gym_env.py:325). We keep all waypoints and
        # start current_target_idx at 1, matching semantics.
        out["waypoint_mask"][c, :n] = True
        out["n_waypoints"][c] = n
        sc = scen_list[c]
        if sc is not None:
            st = np.asarray(sc["agent_states"], np.float32)
            at = np.asarray(sc["agent_attributes"], np.float32)
            k = len(st)
            out["scen_states"][c, :k] = st
            out["scen_attrs"][c, :k] = at
            out["scen_mask"][c, :k] = True
        cs = cseq_list[c]
        if cs:
            for slot, seq in cs.items():
                slot = int(slot)  # merged agent slot: 0=ego, 1..S=scenario agents (gym_env.py:279)
                arr = np.asarray(seq, np.float32)
                t = min(len(arr), MAX_REPLAY_T)
                out["replay_states"][c, slot, :t] = arr[:t]
                out["replay_mask"][c, slot, :t] = True
    return out


def compile_background(background):
    T = len(TOWNS)
    out = dict(
        bg_states=np.zeros((T, MAX_BG_FILES, MAX_AGENTS, 4), np.float32),
        bg_attrs=np.zeros((T, MAX_BG_FILES, MAX_AGENTS, 3), np.float32),
        bg_mask=np.zeros((T, MAX_BG_FILES, MAX_AGENTS), bool),
        bg_density=np.zeros((T, MAX_BG_FILES), np.int32),
        bg_valid=np.zeros((T, MAX_BG_FILES), bool),
    )
    for ti, town in enumerate(TOWNS):
        for fi, j in enumerate(background.get(town, [])[:MAX_BG_FILES]):
            sts = j["agent_states"]
            ats = j["agent_attributes"]
            n = min(len(sts), MAX_AGENTS)
            for k in range(n):
                s, a = sts[k], ats[k]
                out["bg_states"][ti, fi, k] = [s["center"]["x"], s["center"]["y"],
                                               s["orientation"], s["speed"]]
                out["bg_attrs"][ti, fi, k] = [a["length"], a["width"], a["rear_axis_offset"]]
            out["bg_mask"][ti, fi, :n] = True
            out["bg_density"][ti, fi] = j["agent_density"]
            # reference resamples until n_agents + density < 100 (gym_env.py:216)
            out["bg_valid"][ti, fi] = (len(sts) + j["agent_density"]) < 100
    return out


