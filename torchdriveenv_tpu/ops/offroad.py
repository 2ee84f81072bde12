"""Offroad test against the drivable-area SDF.

Replaces torchdrivesim's `compute_offroad()` (mesh distance of agent corners,
consumed at reference gym_env.py:142,415 where only `> 0` matters). The road
mesh becomes a precompiled signed distance grid (tools/compile_assets.py); the
test is 4 bilinear gathers per agent: offroad value = how far the deepest
corner sits outside the drivable region (meters), 0 when fully on-road.
"""

from __future__ import annotations

import jax.numpy as jnp

from torchdriveenv_tpu.maps.arrays import MapArrays, sample_sdf
from torchdriveenv_tpu.ops.collision import obb_corners


def compute_offroad(maps: MapArrays, town: jnp.ndarray, states: jnp.ndarray,
                    sizes: jnp.ndarray) -> jnp.ndarray:
    """states (..., 4), sizes (..., 2) -> offroad distance (...,) >= 0."""
    corners = obb_corners(states, sizes)          # (..., 4, 2)
    sdf = sample_sdf(maps, town, corners)          # (..., 4)
    return jnp.maximum(-jnp.min(sdf, axis=-1), 0.0)
