"""Device-resident map/scenario arrays and their samplers.

TPU-native replacement for the reference's map stack: torchdrivesim's
`find_map_config` (lanelet2 C++ maps + road meshes, consumed at reference
gym_env.py:312,181-189) becomes padded raster grids — a signed distance field
of the drivable area, a lane direction field, and stopline/traffic-light
arrays — sampled with gathers inside the jitted step.

`find_lanelet_directions` (reference gym_env.py:359-366) -> `sample_dir_angle`.
Offroad mesh tests -> `sample_sdf` at agent corners (see ops/offroad.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

import torchdriveenv_tpu


@struct.dataclass
class MapArrays:
    """Per-town raster geometry, padded over towns.

    sdf: (T, G, G) signed distance to the drivable-area boundary in meters,
         positive inside the drivable region.
    dir_angle: (T, G, G) lane direction (radians) of the nearest corridor.
    stoplines/lights: (T, L, ...) synthesized traffic-light stoplines; a light
         cycles green->yellow->red with per-light phase offsets
         (replaces torchdrivesim's traffic_light_controller,
          reference gym_env.py:181-189).
    """

    scale: jnp.ndarray          # () meters per pixel
    origin: jnp.ndarray         # (T, 2) world coords of pixel (0,0) corner
    sdf: jnp.ndarray            # (T, G, G) float16
    dir_angle: jnp.ndarray      # (T, G, G) float16
    sdf_gx: jnp.ndarray         # (T, G, G) float16 d(sdf)/dx
    sdf_gy: jnp.ndarray         # (T, G, G) float16 d(sdf)/dy
    npc_field: jnp.ndarray      # (T, G, G) uint32 packed (dir f16, gx i8, gy i8)
    # analytic road-render index (zero-gather rasterization): per coarse
    # cell, the corridor segments reachable from an obs window in the cell,
    # nearest-first, rows [p0x, p0y, p1x, p1y, sign(hw)*hw^2, 0, 0, 0]
    seg_data: jnp.ndarray       # (T, C, C, K, 8) float32
    seg_cell_n: jnp.ndarray     # (T, C, C) int32 valid-count per cell
    seg_cell: jnp.ndarray       # () cell size in meters
    stop_p0: jnp.ndarray        # (T, L, 2)
    stop_p1: jnp.ndarray        # (T, L, 2)
    stop_dir: jnp.ndarray       # (T, L) approach heading (radians)
    light_phase: jnp.ndarray    # (T, L) seconds
    light_mask: jnp.ndarray     # (T, L) bool
    light_durations: jnp.ndarray  # (3,) green/yellow/red seconds


@struct.dataclass
class SuiteArrays:
    """Padded scenario suite (reference schema gym_env.py:56-68; data from
    torchdriveenv/data/*.yml via tools/compile_assets.py)."""

    case_town: jnp.ndarray      # (C,) int32 index into towns
    waypoints: jnp.ndarray      # (C, W, 2)
    waypoint_mask: jnp.ndarray  # (C, W) bool
    n_waypoints: jnp.ndarray    # (C,) int32
    scen_states: jnp.ndarray    # (C, S, 4) [x, y, psi, speed]
    scen_attrs: jnp.ndarray     # (C, S, 3) [length, width, rear_axis_offset]
    scen_mask: jnp.ndarray      # (C, S) bool
    replay_states: jnp.ndarray  # (C, 1+S, RT, 4) log-replay trajectories
    replay_mask: jnp.ndarray    # (C, 1+S, RT) bool


@struct.dataclass
class BackgroundArrays:
    """Cached background traffic (reference resources/background_traffic/*.json,
    sampled per episode at gym_env.py:200-217)."""

    bg_states: jnp.ndarray      # (T, F, A, 4)
    bg_attrs: jnp.ndarray       # (T, F, A, 3)
    bg_mask: jnp.ndarray        # (T, F, A) bool
    bg_density: jnp.ndarray     # (T, F) int32
    bg_valid: jnp.ndarray       # (T, F) bool — n_agents + density < 100


@struct.dataclass
class Assets:
    maps: MapArrays
    suite: SuiteArrays
    background: BackgroundArrays


def _assets_dir() -> str:
    return torchdriveenv_tpu._data_path[0]


def load_assets(suite: str = "train", assets_dir: Optional[str] = None,
                sdf_dtype=jnp.float32) -> Assets:
    """Load compiled asset bundles onto the default device.

    suite: "train" (100 cases) or "val" (the 5 validation scenarios,
    reference data/validation_cases.yml / README.md:15-27).
    """
    d = assets_dir or _assets_dir()
    m = np.load(os.path.join(d, "maps_v1.npz"))
    s = np.load(os.path.join(d, f"suite_{suite}_v1.npz"))
    b = np.load(os.path.join(d, "background_v1.npz"))
    maps = MapArrays(
        scale=jnp.asarray(m["scale"], jnp.float32),
        origin=jnp.asarray(m["origin"], jnp.float32),
        sdf=jnp.asarray(m["sdf"], sdf_dtype),
        dir_angle=jnp.asarray(m["dir_angle"], jnp.float32),
        sdf_gx=jnp.asarray(m["sdf_gx"], jnp.float16),
        sdf_gy=jnp.asarray(m["sdf_gy"], jnp.float16),
        npc_field=jnp.asarray(m["npc_field"], jnp.uint32),
        seg_data=jnp.asarray(m["seg_data"], jnp.float32),
        seg_cell_n=jnp.asarray(m["seg_cell_n"], jnp.int32),
        seg_cell=jnp.asarray(m["seg_cell"], jnp.float32),
        stop_p0=jnp.asarray(m["stop_p0"], jnp.float32),
        stop_p1=jnp.asarray(m["stop_p1"], jnp.float32),
        stop_dir=jnp.asarray(m["stop_dir"], jnp.float32),
        light_phase=jnp.asarray(m["light_phase"], jnp.float32),
        light_mask=jnp.asarray(m["light_mask"]),
        light_durations=jnp.asarray(m["light_durations"], jnp.float32),
    )
    suite_arrays = SuiteArrays(
        case_town=jnp.asarray(s["case_town"], jnp.int32),
        waypoints=jnp.asarray(s["waypoints"], jnp.float32),
        waypoint_mask=jnp.asarray(s["waypoint_mask"]),
        n_waypoints=jnp.asarray(s["n_waypoints"], jnp.int32),
        scen_states=jnp.asarray(s["scen_states"], jnp.float32),
        scen_attrs=jnp.asarray(s["scen_attrs"], jnp.float32),
        scen_mask=jnp.asarray(s["scen_mask"]),
        replay_states=jnp.asarray(s["replay_states"], jnp.float32),
        replay_mask=jnp.asarray(s["replay_mask"]),
    )
    background = BackgroundArrays(
        bg_states=jnp.asarray(b["bg_states"], jnp.float32),
        bg_attrs=jnp.asarray(b["bg_attrs"], jnp.float32),
        bg_mask=jnp.asarray(b["bg_mask"]),
        bg_density=jnp.asarray(b["bg_density"], jnp.int32),
        bg_valid=jnp.asarray(b["bg_valid"]),
    )
    return Assets(maps=maps, suite=suite_arrays, background=background)


# ---------------------------------------------------------------------------
# samplers (pure, vmap-able; `town` is a traced scalar index)
# ---------------------------------------------------------------------------


def _pixel_coords(maps: MapArrays, town: jnp.ndarray, xy: jnp.ndarray):
    """World xy (..., 2) -> continuous pixel coords in town grid."""
    origin = maps.origin[town]  # (2,)
    return (xy - origin) / maps.scale - 0.5


def _gather_town_grid(grid: jnp.ndarray, town: jnp.ndarray, ix: jnp.ndarray,
                      iy: jnp.ndarray) -> jnp.ndarray:
    """Gather grid[town, ix, iy] without ever materializing grid[town].

    Under `vmap` over envs, `grid[town]` lowers to a per-env (G, G) slice —
    a catastrophic (B, G, G) temp on TPU (16 GB at B=4096, G=1024). Flattened
    1-D indexing keeps the gather elementwise over the query points only.
    """
    g = grid.shape[-1]
    flat = grid.reshape(-1)
    idx = (town * g + ix) * g + iy
    return flat[idx]


def sample_sdf(maps: MapArrays, town: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of the drivable-area SDF (meters, + inside) at world
    coords xy (..., 2). Returns (...,)."""
    g = maps.sdf.shape[-1]
    p = _pixel_coords(maps, town, xy)
    p = jnp.clip(p, 0.0, g - 1.001)
    i0 = jnp.floor(p).astype(jnp.int32)
    f = p - i0
    i1 = jnp.minimum(i0 + 1, g - 1)
    v00 = _gather_town_grid(maps.sdf, town, i0[..., 0], i0[..., 1]).astype(jnp.float32)
    v01 = _gather_town_grid(maps.sdf, town, i0[..., 0], i1[..., 1]).astype(jnp.float32)
    v10 = _gather_town_grid(maps.sdf, town, i1[..., 0], i0[..., 1]).astype(jnp.float32)
    v11 = _gather_town_grid(maps.sdf, town, i1[..., 0], i1[..., 1]).astype(jnp.float32)
    fx, fy = f[..., 0], f[..., 1]
    return ((v00 * (1 - fx) + v10 * fx) * (1 - fy)
            + (v01 * (1 - fx) + v11 * fx) * fy)


def sample_sdf_nearest(maps: MapArrays, town: jnp.ndarray,
                       xy: jnp.ndarray) -> jnp.ndarray:
    """Single-gather nearest-neighbor SDF sample (meters, + inside). The
    cheap variant for validity-style checks where 0.5 px quantization is
    irrelevant (spawn-candidate filtering, rendering)."""
    g = maps.sdf.shape[-1]
    p = _pixel_coords(maps, town, xy)
    i = jnp.clip(jnp.round(p).astype(jnp.int32), 0, g - 1)
    return _gather_town_grid(maps.sdf, town, i[..., 0],
                             i[..., 1]).astype(jnp.float32)


def sample_sdf_grad(maps: MapArrays, town: jnp.ndarray, xy: jnp.ndarray):
    """Nearest-neighbor SDF gradient sample -> (gx, gy) each (...,).

    Two gathers replacing the 8 bilinear-gather finite difference the NPC
    edge-steering term would otherwise need (npc/route_follow.py)."""
    g = maps.sdf_gx.shape[-1]
    p = _pixel_coords(maps, town, xy)
    i = jnp.clip(jnp.round(p).astype(jnp.int32), 0, g - 1)
    gx = _gather_town_grid(maps.sdf_gx, town, i[..., 0], i[..., 1])
    gy = _gather_town_grid(maps.sdf_gy, town, i[..., 0], i[..., 1])
    return gx.astype(jnp.float32), gy.astype(jnp.float32)


def sample_npc_field(maps: MapArrays, town: jnp.ndarray, xy: jnp.ndarray):
    """One nearest-neighbor gather -> (dir_angle, sdf_gx, sdf_gy), each (...,).

    The packed control field (tools/compile_assets.py) fuses what the NPC
    controller would otherwise fetch with three separate grid gathers —
    scattered gathers are the dominant physics cost on TPU."""
    g = maps.npc_field.shape[-1]
    p = _pixel_coords(maps, town, xy)
    i = jnp.clip(jnp.round(p).astype(jnp.int32), 0, g - 1)
    u = _gather_town_grid(maps.npc_field, town, i[..., 0], i[..., 1])
    dir_angle = jax.lax.bitcast_convert_type(
        (u & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    gx = (((u >> 16) & 0xFF).astype(jnp.float32) - 128.0) / 32.0
    gy = (((u >> 24) & 0xFF).astype(jnp.float32) - 128.0) / 32.0
    return dir_angle, gx, gy


def sample_dir_angle(maps: MapArrays, town: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor sample of the lane direction field (radians) at world
    coords xy (..., 2). Replaces `find_lanelet_directions(...)[0]`
    (reference gym_env.py:359-366); defined everywhere (nearest corridor)."""
    g = maps.dir_angle.shape[-1]
    p = _pixel_coords(maps, town, xy)
    i = jnp.clip(jnp.round(p).astype(jnp.int32), 0, g - 1)
    return _gather_town_grid(maps.dir_angle, town, i[..., 0],
                             i[..., 1]).astype(jnp.float32)
