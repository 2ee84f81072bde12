#!/usr/bin/env python
"""CLI for the offline asset compiler (logic lives in
torchdriveenv_tpu/maps/compile.py so runtime code can also compile custom
user data)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from torchdriveenv_tpu.maps import compile as mc  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "..",
                                                  "torchdriveenv_tpu", "assets"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    suites = mc.load_suites(args.reference)
    background = mc.load_background(args.reference)

    maps = dict(
        scale=np.float32(mc.SCALE),
        origin=np.zeros((len(mc.TOWNS), 2), np.float32),
        sdf=np.zeros((len(mc.TOWNS), mc.GRID, mc.GRID), np.float16),
        dir_angle=np.zeros((len(mc.TOWNS), mc.GRID, mc.GRID), np.float16),
        sdf_gx=np.zeros((len(mc.TOWNS), mc.GRID, mc.GRID), np.float16),
        sdf_gy=np.zeros((len(mc.TOWNS), mc.GRID, mc.GRID), np.float16),
        npc_field=np.zeros((len(mc.TOWNS), mc.GRID, mc.GRID), np.uint32),
        stop_p0=np.zeros((len(mc.TOWNS), mc.MAX_LIGHTS, 2), np.float32),
        stop_p1=np.zeros((len(mc.TOWNS), mc.MAX_LIGHTS, 2), np.float32),
        stop_dir=np.zeros((len(mc.TOWNS), mc.MAX_LIGHTS), np.float32),
        light_phase=np.zeros((len(mc.TOWNS), mc.MAX_LIGHTS), np.float32),
        light_mask=np.zeros((len(mc.TOWNS), mc.MAX_LIGHTS), bool),
        light_durations=np.asarray([mc.LIGHT_GREEN, mc.LIGHT_YELLOW, mc.LIGHT_RED], np.float32),
    )
    seg_data = np.zeros((len(mc.TOWNS), mc.SEG_GRID, mc.SEG_GRID,
                         mc.SEG_K, mc.SEG_F), np.float32)
    seg_data[..., 4] = -1.0
    maps.update(
        seg_data=seg_data,
        seg_cell=np.float32(mc.SEG_CELL),
        seg_cell_n=np.zeros((len(mc.TOWNS), mc.SEG_GRID, mc.SEG_GRID), np.int32),
    )
    for ti, town in enumerate(mc.TOWNS):
        segs, pts, render_segs = mc.town_content(suites, background, town)
        origin, sdf, dirs = mc.compile_town_map(segs, pts)
        maps["origin"][ti] = origin
        maps["sdf"][ti] = sdf.astype(np.float16)
        maps["dir_angle"][ti] = dirs.astype(np.float16)
        # SDF gradient (unit-ish) for one-gather road-edge steering
        gx, gy = np.gradient(sdf.astype(np.float32), mc.SCALE)
        maps["sdf_gx"][ti] = np.clip(gx, -1.5, 1.5).astype(np.float16)
        maps["sdf_gy"][ti] = np.clip(gy, -1.5, 1.5).astype(np.float16)
        # packed NPC control field: ONE gather yields (dir f16, gx i8, gy i8)
        dir16 = dirs.astype(np.float16).view(np.uint16).astype(np.uint32)
        q = lambda g: np.clip(np.round(g * 32.0) + 128, 0, 255).astype(np.uint32)
        maps["npc_field"][ti] = dir16 | (q(gx) << 16) | (q(gy) << 24)
        seg_idx, k_max = mc.compile_segment_index(render_segs, origin)
        for k, v in seg_idx.items():
            maps[k][ti] = v
        lights, nl = mc.synthesize_lights(suites, town)
        for k, v in lights.items():
            maps[k][ti] = v
        drv = float((sdf > 0).mean())
        mc.log(f"{town}: {len(segs)} segments, drivable {drv:.1%}, {nl} lights, "
               f"seg-index kmax {k_max}, origin {origin}")

    np.savez_compressed(os.path.join(args.out, "maps_v1.npz"), town_names=np.array(mc.TOWNS), **maps)
    np.savez_compressed(os.path.join(args.out, "suite_train_v1.npz"), **mc.compile_suite(suites["train"]))
    np.savez_compressed(os.path.join(args.out, "suite_val_v1.npz"), **mc.compile_suite(suites["val"]))
    np.savez_compressed(os.path.join(args.out, "background_v1.npz"), **mc.compile_background(background))
    for fn in ["maps_v1.npz", "suite_train_v1.npz", "suite_val_v1.npz", "background_v1.npz"]:
        p = os.path.join(args.out, fn)
        mc.log(f"{fn}: {os.path.getsize(p) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()
