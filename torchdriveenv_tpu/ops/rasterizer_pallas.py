"""Fused TPU (Pallas) birdview rasterizer — the hot observation kernel.

The reference's renderer is pytorch3d CUDA rasterization or OpenCV drawing
(reference gym_env.py:18-19,46-49; README.md:47-49). The pure-XLA rasterizer
(ops/rasterizer.py) replaced it with per-pixel SDF-grid gathers + OBB tests,
but on TPU the 16.8M scattered HBM gathers per 4096-env step dominate the
whole program. This module removes every gather from the hot path:

  * road layer: each pixel is tested ANALYTICALLY against the corridor
    segments near the ego. Per-cell segment blocks (``MapArrays.seg_data``,
    nearest-first with a count for block skipping) are streamed HBM->VMEM by
    the Pallas pipeline via scalar-prefetched (town, cell) indices — a dense
    DMA, not a gather.
  * agents / stoplines / waypoint: culled and packed per env by
    ``prepare_obs_inputs`` (plain XLA), then evaluated per pixel in VMEM.

One grid step = one env: the kernel computes the full 64x64x3 uint8 frame in
VMEM with (32, 128)-shaped ops (the native f32 VPU tile over the 4096-pixel
image) and never materializes an intermediate in HBM.

``render_observation`` is the public batched entry point; it dispatches to
the kernel on TPU and to ``render_obs_ref`` — an XLA twin implementing
bit-identical math — elsewhere. The twin is also the oracle for the
equivalence tests (tests/test_rasterizer_pallas.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torchdriveenv_tpu.maps.arrays import MapArrays
from torchdriveenv_tpu.ops.rasterizer import (
    COLOR_BACKGROUND,
    COLOR_EGO,
    COLOR_LIGHT,
    COLOR_NPC,
    COLOR_ROAD,
    COLOR_WAYPOINT,
    RENDER_MAX_AGENTS,
    RENDER_MAX_LIGHTS,
    RENDER_MAX_WAYPOINTS,
    STOPLINE_HALF_THICK,
    WAYPOINT_RADIUS,
)
from torchdriveenv_tpu.ops.traffic_lights import light_states_at

SEG_BLOCK = 32   # predication granularity over the per-cell segment list
SEG_CHUNK = 8    # segments per fused (SEG_CHUNK, 32, 128) vector op
N_LANES = 128    # flat pixel layout: (res*res // 128, 128)

# palette as Python floats (kernel-embeddable compile-time constants)
import numpy as _np

_BG = tuple(float(x) for x in _np.asarray(COLOR_BACKGROUND))
_ROAD = tuple(float(x) for x in _np.asarray(COLOR_ROAD))
_WP = tuple(float(x) for x in _np.asarray(COLOR_WAYPOINT))
_NPC = tuple(float(x) for x in _np.asarray(COLOR_NPC))
_EGO = tuple(float(x) for x in _np.asarray(COLOR_EGO))


# ---------------------------------------------------------------------------
# per-env cull & pack (plain XLA; shared by the kernel and its XLA twin)
# ---------------------------------------------------------------------------


def prepare_obs_inputs(maps: MapArrays, town: jnp.ndarray, t: jnp.ndarray,
                       agent_states: jnp.ndarray, agent_attrs: jnp.ndarray,
                       present: jnp.ndarray, waypoints: jnp.ndarray,
                       target_idx: jnp.ndarray, n_waypoints: jnp.ndarray,
                       fov: float):
    """Cull and pack one env's render inputs into fixed blocks.

    Returns (ci, cj, nseg, env_block (8, 8), agent_block (16, 8),
             wp_block (8, 8)):
      env_block row 0: ego  [x, y, cos, sin, half_len, half_wid, 0, 0]
      env_block rows 2..5: stoplines [p0x, p0y, p1x, p1y, r, g, b, active]
      agent_block rows: NPCs [x, y, cos, sin, half_len, half_wid, present, 0]
      wp_block rows: waypoints [x, y, valid, 0, ...]
    """
    ego = agent_states[0]
    c_ego, s_ego = jnp.cos(ego[2]), jnp.sin(ego[2])

    # full masked waypoint sequence culled to the nearest visible discs
    # (the reference renders every waypoint except index 0 all episode,
    # gym_env.py:252-257; `target_idx` kept in the signature for API
    # stability but rendering does not depend on it)
    del target_idx
    w = waypoints.shape[0]
    wp_ids = jnp.arange(w)
    wp_mask = (wp_ids >= 1) & (wp_ids < n_waypoints)
    wp_d2 = jnp.sum((waypoints - ego[None, :2]) ** 2, axis=-1)
    wp_half_diag = fov * 0.7071 + WAYPOINT_RADIUS
    wp_visible = wp_mask & (wp_d2 < wp_half_diag * wp_half_diag)
    wk = min(RENDER_MAX_WAYPOINTS, w)
    _, w_top = jax.lax.top_k(jnp.where(wp_visible, -wp_d2, -jnp.inf), wk)
    wp_rows = jnp.concatenate([
        waypoints[w_top], wp_visible[w_top][:, None].astype(jnp.float32),
        jnp.zeros((wk, 5))], axis=-1)                              # (wk, 8)
    wp_block = jnp.pad(wp_rows, ((0, 8 - wk), (0, 0)))

    # stoplines culled to the nearest RENDER_MAX_LIGHTS visible lights
    p0_all, p1_all = maps.stop_p0[town], maps.stop_p1[town]
    mid = (p0_all + p1_all) * 0.5
    l_d2 = jnp.sum((mid - ego[None, :2]) ** 2, axis=-1)
    half_diag_l = fov * 0.7071 + 8.0
    l_visible = maps.light_mask[town] & (l_d2 < half_diag_l * half_diag_l)
    lk = min(RENDER_MAX_LIGHTS, p0_all.shape[0])
    _, l_top = jax.lax.top_k(jnp.where(l_visible, -l_d2, -jnp.inf), lk)
    states_l = light_states_at(maps, town, t)[l_top]
    sl_color = COLOR_LIGHT[jnp.clip(states_l, 0, 2)]               # (lk, 3)
    sl_rows = jnp.concatenate([
        p0_all[l_top], p1_all[l_top], sl_color,
        l_visible[l_top][:, None].astype(jnp.float32)], axis=-1)   # (lk, 8)
    sl_rows = jnp.pad(sl_rows, ((0, 4 - lk), (0, 0)))

    # agents culled to the nearest RENDER_MAX_AGENTS visible NPCs
    a = agent_states.shape[0]
    npc_mask = present & (jnp.arange(a) > 0)
    half_diag_a = fov * 0.7071 + 4.0
    d2 = jnp.sum((agent_states[:, :2] - ego[None, :2]) ** 2, axis=-1)
    visible = npc_mask & (d2 < half_diag_a * half_diag_a)
    k = min(RENDER_MAX_AGENTS, a)
    _, top = jax.lax.top_k(jnp.where(visible, -d2, -jnp.inf), k)
    st, at = agent_states[top], agent_attrs[top]
    agent_block = jnp.stack([
        st[:, 0], st[:, 1], jnp.cos(st[:, 2]), jnp.sin(st[:, 2]),
        at[:, 0] * 0.5, at[:, 1] * 0.5,
        visible[top].astype(jnp.float32), jnp.zeros((k,))], axis=-1)
    agent_block = jnp.pad(agent_block, ((0, 16 - k), (0, 0)))

    env_block = jnp.zeros((8, 8))
    env_block = env_block.at[0].set(jnp.stack([
        ego[0], ego[1], c_ego, s_ego,
        agent_attrs[0, 0] * 0.5, agent_attrs[0, 1] * 0.5, 0.0, 0.0]))
    env_block = env_block.at[2:6].set(sl_rows)

    # coarse segment-index cell of the ego
    cgrid = maps.seg_cell_n.shape[-1]
    cell = ((ego[:2] - maps.origin[town]) / maps.seg_cell).astype(jnp.int32)
    cell = jnp.clip(cell, 0, cgrid - 1)
    nseg = maps.seg_cell_n[town, cell[0], cell[1]]
    return cell[0], cell[1], nseg, env_block, agent_block, wp_block


# ---------------------------------------------------------------------------
# shared per-pixel math (used by both the kernel and the XLA twin so that the
# two paths are the same arithmetic expression)
# ---------------------------------------------------------------------------


def _pixel_world(ego, res: int, fov: float, left_handed: bool,
                 img_row, img_col):
    """World coords of pixel centers given image row/col index arrays."""
    m_per_px = fov / res
    fwd = -(img_row - (res - 1) / 2.0) * m_per_px
    rgt = (img_col - (res - 1) / 2.0) * m_per_px
    if left_handed:
        rgt = -rgt
    ex, ey, c, s = ego[0], ego[1], ego[2], ego[3]
    px = ex + fwd * c + rgt * s
    py = ey + fwd * s - rgt * c
    return px, py


def _seg_chunk_hit(chunk, px, py):
    """chunk (SEG_CHUNK, 8) segment rows vs px/py (*pix): -> (*pix) bool."""
    ax, ay = chunk[:, 0:1], chunk[:, 1:2]
    sx, sy = chunk[:, 2:3] - ax, chunk[:, 3:4] - ay
    shw2 = chunk[:, 4:5]
    inv_len2 = 1.0 / jnp.maximum(sx * sx + sy * sy, 1e-9)

    shape = (chunk.shape[0],) + px.shape
    bc = lambda v: jax.lax.broadcast_in_dim(v, shape, (0, 1))
    relx = px[None] - bc(ax)
    rely = py[None] - bc(ay)
    sxb, syb = bc(sx), bc(sy)
    tt = jnp.clip((relx * sxb + rely * syb) * bc(inv_len2), 0.0, 1.0)
    dx = relx - tt * sxb
    dy = rely - tt * syb
    return jnp.any(dx * dx + dy * dy <= bc(shw2), axis=0)


def _obb_hit(rows, px, py):
    """rows (A, 8) agent rows vs px/py -> (*pix) bool any-covered."""
    shape = (rows.shape[0],) + px.shape
    bc = lambda v: jax.lax.broadcast_in_dim(v, shape, (0, 1))
    relx = px[None] - bc(rows[:, 0:1])
    rely = py[None] - bc(rows[:, 1:2])
    c, s = bc(rows[:, 2:3]), bc(rows[:, 3:4])
    lx = relx * c + rely * s
    ly = -relx * s + rely * c
    hit = ((jnp.abs(lx) <= bc(rows[:, 4:5]))
           & (jnp.abs(ly) <= bc(rows[:, 5:6]))
           & (bc(rows[:, 6:7]) > 0.0))
    return jnp.any(hit, axis=0)


def _seg_dist2_scalar(p0x, p0y, p1x, p1y, px, py):
    """Single segment (scalars) vs px/py arrays -> squared distance."""
    sx, sy = p1x - p0x, p1y - p0y
    inv_len2 = 1.0 / jnp.maximum(sx * sx + sy * sy, 1e-9)
    relx, rely = px - p0x, py - p0y
    tt = jnp.clip((relx * sx + rely * sy) * inv_len2, 0.0, 1.0)
    dx, dy = relx - tt * sx, rely - tt * sy
    return dx * dx + dy * dy


def _wp_hit(wp_block, px, py):
    """wp_block (W, 8) waypoint rows [x, y, valid, ...] vs px/py
    -> (*pix) bool any-inside-disc."""
    shape = (wp_block.shape[0],) + px.shape
    bc = lambda v: jax.lax.broadcast_in_dim(v, shape, (0, 1))
    dx = px[None] - bc(wp_block[:, 0:1])
    dy = py[None] - bc(wp_block[:, 1:2])
    hit = ((dx * dx + dy * dy < WAYPOINT_RADIUS * WAYPOINT_RADIUS)
           & (bc(wp_block[:, 2:3]) > 0.0))
    return jnp.any(hit, axis=0)


def _composite(px, py, road, env_block, agent_block, wp_block,
               highlight_ego: bool):
    """Overlay stack -> 3 float planes shaped like px."""
    ego_row = env_block[0]
    wp_hit = _wp_hit(wp_block, px, py)
    npc_hit = _obb_hit(agent_block, px, py)

    # ego OBB from scalars
    relx, rely = px - ego_row[0], py - ego_row[1]
    lx = relx * ego_row[2] + rely * ego_row[3]
    ly = -relx * ego_row[3] + rely * ego_row[2]
    ego_hit = (jnp.abs(lx) <= ego_row[4]) & (jnp.abs(ly) <= ego_row[5])

    thick2 = STOPLINE_HALF_THICK * STOPLINE_HALF_THICK
    chans = []
    ego_color = _EGO if highlight_ego else _NPC
    for ch in range(3):
        v = jnp.full(px.shape, _BG[ch])
        v = jnp.where(road, _ROAD[ch], v)
        v = jnp.where(wp_hit, _WP[ch], v)
        # reverse order => nearest stopline wins on overlap
        for k_sl in range(3, -1, -1):
            sl = env_block[2 + k_sl]
            d2 = _seg_dist2_scalar(sl[0], sl[1], sl[2], sl[3], px, py)
            sl_hit = (d2 < thick2) & (sl[7] > 0.0)
            v = jnp.where(sl_hit, sl[4 + ch], v)
        v = jnp.where(npc_hit, _NPC[ch], v)
        v = jnp.where(ego_hit, ego_color[ch], v)
        chans.append(v)
    return chans


# ---------------------------------------------------------------------------
# the Pallas kernel
# ---------------------------------------------------------------------------


def _make_kernel(res: int, fov: float, left_handed: bool, highlight_ego: bool,
                 seg_k: int):
    n_sub = res * res // N_LANES
    n_blocks = seg_k // SEG_BLOCK

    def kernel(town_ref, ci_ref, cj_ref, nseg_ref,      # scalar prefetch
               seg_ref, env_ref, ag_ref, wp_ref,        # VMEM inputs
               out_ref,                                 # (1, 3, n_sub, 128)
               road_ref):                               # scratch (n_sub, 128)
        i = pl.program_id(0)
        nseg = nseg_ref[i]
        env_block = env_ref[0]                          # (8, 8)
        ego_row = env_block[0]

        # flat pixel -> image row/col (image is res x res, row-major);
        # tpu.iota is integer-only, cast after
        r_id = jax.lax.broadcasted_iota(
            jnp.int32, (n_sub, N_LANES), 0).astype(jnp.float32)
        l_id = jax.lax.broadcasted_iota(
            jnp.int32, (n_sub, N_LANES), 1).astype(jnp.float32)
        flat = r_id * N_LANES + l_id
        img_row = jnp.floor(flat / res)
        img_col = flat - img_row * res
        px, py = _pixel_world(ego_row, res, fov, left_handed, img_row, img_col)

        # road layer: predicated blocks over the nearest-first segment list
        road_ref[:, :] = jnp.zeros((n_sub, N_LANES), jnp.float32)
        for b in range(n_blocks):
            @pl.when(b * SEG_BLOCK < nseg)
            def _(b=b):
                acc = road_ref[:, :]
                for ch in range(SEG_BLOCK // SEG_CHUNK):
                    s0 = b * SEG_BLOCK + ch * SEG_CHUNK
                    chunk = seg_ref[0, 0, 0, s0:s0 + SEG_CHUNK, :]
                    hit = _seg_chunk_hit(chunk, px, py)
                    acc = jnp.maximum(acc, hit.astype(jnp.float32))
                road_ref[:, :] = acc
        road = road_ref[:, :] > 0.0

        chans = _composite(px, py, road, env_block, ag_ref[0], wp_ref[0],
                           highlight_ego)
        # Mosaic has no f32->uint8 cast; route through int32
        out_ref[0] = jnp.stack(chans).astype(jnp.int32).astype(jnp.uint8)

    return kernel, n_sub, n_blocks


@functools.partial(jax.jit, static_argnames=("res", "fov", "left_handed",
                                             "highlight_ego", "interpret"))
def _render_pallas(maps: MapArrays, town, ci, cj, nseg, env_block, agent_block,
                   wp_block, res: int = 64, fov: float = 70.0,
                   left_handed: bool = True,
                   highlight_ego: bool = True, interpret: bool = False):
    B = town.shape[0]
    seg_k = maps.seg_data.shape[3]
    assert (res * res) % N_LANES == 0, "res*res must be a multiple of 128"
    assert seg_k % SEG_BLOCK == 0
    kernel, n_sub, _ = _make_kernel(res, fov, left_handed, highlight_ego, seg_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, seg_k, 8),
                lambda i, town, ci, cj, ns: (town[i], ci[i], cj[i], 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, n_sub, N_LANES),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_sub, N_LANES), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3, n_sub, N_LANES), jnp.uint8),
        grid_spec=grid_spec,
        interpret=interpret,
    )(town.astype(jnp.int32), ci.astype(jnp.int32), cj.astype(jnp.int32),
      nseg.astype(jnp.int32), maps.seg_data, env_block, agent_block,
      wp_block)
    return out.reshape(B, 3, res, res)


# ---------------------------------------------------------------------------
# XLA twin (bit-identical math; CPU path and test oracle)
# ---------------------------------------------------------------------------


def render_obs_ref(maps: MapArrays, town, ci, cj, nseg, env_block, agent_block,
                   wp_block, res: int = 64, fov: float = 70.0,
                   left_handed: bool = True,
                   highlight_ego: bool = True) -> jnp.ndarray:
    """Single-env render from packed blocks -> (3, res, res) uint8."""
    seg = maps.seg_data[town, ci, cj]                   # (K, 8)
    idx = jnp.arange(res, dtype=jnp.float32)
    img_row, img_col = jnp.meshgrid(idx, idx, indexing="ij")
    px, py = _pixel_world(env_block[0], res, fov, left_handed,
                          img_row, img_col)

    k = seg.shape[0]
    road = jnp.zeros((res, res), bool)
    for s0 in range(0, k, SEG_CHUNK):
        road = road | _seg_chunk_hit(seg[s0:s0 + SEG_CHUNK], px, py)

    chans = _composite(px, py, road, env_block, agent_block, wp_block,
                       highlight_ego)
    return jnp.stack(chans).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# public batched entry point
# ---------------------------------------------------------------------------


def render_observation(maps: MapArrays, town, t, agent_states, agent_attrs,
                       present, waypoints, target_idx, n_waypoints,
                       res: int = 64, fov: float = 70.0,
                       left_handed: bool = True, highlight_ego: bool = True,
                       backend: str = "auto") -> jnp.ndarray:
    """Batched egocentric birdview -> (B, 3, res, res) uint8.

    All env args carry a leading batch axis. `backend`: "pallas", "xla", or
    "auto" (pallas on TPU, xla otherwise).
    """
    prep = jax.vmap(functools.partial(
        prepare_obs_inputs, maps, fov=fov))(
        town, t, agent_states, agent_attrs, present, waypoints,
        target_idx, n_waypoints)
    ci, cj, nseg, env_block, agent_block, wp_block = prep

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas":
        return _render_pallas(maps, town, ci, cj, nseg, env_block,
                              agent_block, wp_block, res=res, fov=fov,
                              left_handed=left_handed,
                              highlight_ego=highlight_ego)
    fn = functools.partial(render_obs_ref, res=res, fov=fov,
                           left_handed=left_handed,
                           highlight_ego=highlight_ego)
    return jax.vmap(functools.partial(fn, maps))(
        town, ci, cj, nseg, env_block, agent_block, wp_block)
