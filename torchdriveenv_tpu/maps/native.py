"""ctypes bindings for the native map-compilation kernels (csrc/mapkit.cpp).

The reference delegates map geometry to lanelet2, a C++ library loaded at
runtime (reference Dockerfile:22, gym_env.py:312 via torchdrivesim). The TPU
build compiles maps offline instead; this module is the native hot path of
that offline compiler — corridor rasterization, exact Euclidean distance
transforms, SDF and direction-field construction over 1024x1024 grids.

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes). All entry points have pure numpy/scipy fallbacks in
maps/compile.py, selected automatically when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "mapkit.cpp")
_OUT_DIR = os.path.join(os.path.dirname(__file__), "_native")
_OUT = os.path.join(_OUT_DIR, "libmapkit.so")

_lock = threading.Lock()
_lib_cache: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    os.makedirs(_OUT_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           src, "-o", _OUT]
    for extra in (["-fopenmp"], []):
        try:
            r = subprocess.run(cmd[:1] + extra + cmd[1:],
                               capture_output=True, timeout=120)
            if r.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            return False
    print("[mapkit] native build failed:", r.stderr.decode()[:500],
          file=sys.stderr)
    return False


def _lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib_cache, _lib_failed
    if _lib_cache is not None or _lib_failed:
        return _lib_cache
    with _lock:
        if _lib_cache is not None or _lib_failed:
            return _lib_cache
        if os.environ.get("TDE_TPU_NO_NATIVE"):
            _lib_failed = True
            return None
        if not os.path.exists(_OUT) and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_OUT)
        except OSError:
            _lib_failed = True
            return None
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.mapkit_stamp_segments.argtypes = [
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            f64, f64, f64, ctypes.c_int, u8, f32, f32]
        lib.mapkit_edt.argtypes = [ctypes.c_int, u8, f32, i32]
        lib.mapkit_sdf.argtypes = [ctypes.c_int, u8, ctypes.c_float, f32]
        lib.mapkit_propagate_dir.argtypes = [ctypes.c_int, u8, f32, f32]
        lib.mapkit_version.restype = ctypes.c_int
        _lib_cache = lib
        return lib


def available() -> bool:
    return _lib() is not None


def stamp_segments(grid: int, origin: np.ndarray, scale: float,
                   p0: np.ndarray, p1: np.ndarray, halfwidth: np.ndarray,
                   drivable: np.ndarray, dir_best_d: np.ndarray,
                   dir_angle: np.ndarray) -> None:
    """In-place corridor stamp of n segments into (grid, grid) layers."""
    lib = _lib()
    assert lib is not None
    lib.mapkit_stamp_segments(
        grid, float(origin[0]), float(origin[1]), float(scale),
        np.ascontiguousarray(p0, np.float64),
        np.ascontiguousarray(p1, np.float64),
        np.ascontiguousarray(halfwidth, np.float64),
        int(len(halfwidth)), drivable, dir_best_d, dir_angle)


def edt(source: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Distance (pixels) to the nearest nonzero of `source`, + its flat index."""
    lib = _lib()
    assert lib is not None
    g = source.shape[0]
    dist = np.empty((g, g), np.float32)
    idx = np.empty((g, g), np.int32)
    lib.mapkit_edt(g, np.ascontiguousarray(source, np.uint8), dist, idx)
    return dist, idx


def sdf(drivable: np.ndarray, scale: float) -> np.ndarray:
    """Signed distance field (meters), positive inside drivable area."""
    lib = _lib()
    assert lib is not None
    g = drivable.shape[0]
    out = np.empty((g, g), np.float32)
    lib.mapkit_sdf(g, np.ascontiguousarray(drivable, np.uint8),
                   float(scale), out)
    return out


def propagate_dir(covered: np.ndarray, dir_angle: np.ndarray) -> np.ndarray:
    """Direction of nearest covered pixel, for every pixel."""
    lib = _lib()
    assert lib is not None
    g = covered.shape[0]
    out = np.empty((g, g), np.float32)
    lib.mapkit_propagate_dir(g, np.ascontiguousarray(covered, np.uint8),
                             np.ascontiguousarray(dir_angle, np.float32), out)
    return out
