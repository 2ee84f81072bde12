"""Waypoint reach/advance logic.

Reference semantics (gym_env.py:378-394): the current target is
waypoints[target_idx] (starting at 1); it is "reached" when the ego center is
within 3 m; the target then advances, and when the route is exhausted no
further bonuses are possible.
"""

from __future__ import annotations

import jax.numpy as jnp

REACH_RADIUS = 3.0  # meters (reference gym_env.py:394)


def waypoint_reached(ego_xy: jnp.ndarray, waypoints: jnp.ndarray,
                     target_idx: jnp.ndarray, n_waypoints: jnp.ndarray) -> jnp.ndarray:
    """ego_xy (2,), waypoints (W, 2), target_idx (), n_waypoints () ->
    bool: current target exists and is within REACH_RADIUS."""
    w = waypoints.shape[0]
    idx = jnp.clip(target_idx, 0, w - 1)
    target = waypoints[idx]
    valid = target_idx < n_waypoints
    dist = jnp.linalg.norm(ego_xy - target)
    return valid & (dist < REACH_RADIUS)
