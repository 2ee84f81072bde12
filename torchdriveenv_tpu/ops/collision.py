"""Oriented-bounding-box collision tests.

Replaces torchdrivesim's collision metrics (`CollisionMetric.nograd`,
reference gym_env.py:48; `simulator.compute_collision()` consumed at
gym_env.py:143,415 where only `> 0` matters for termination).

We compute the exact separating-axis (SAT) penetration depth between oriented
rectangles: 0 when disjoint, the minimum translation distance (meters) when
overlapping. Masked against absent agents; fully vectorized over padded agent
axes — no data-dependent shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def obb_corners(states: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """Corners of oriented boxes.

    states: (..., 4) [x, y, psi, v]; sizes: (..., 2) [length, width]
    returns (..., 4, 2).
    """
    x, y, psi = states[..., 0], states[..., 1], states[..., 2]
    hl, hw = sizes[..., 0] / 2.0, sizes[..., 1] / 2.0
    c, s = jnp.cos(psi), jnp.sin(psi)
    # local corners (+-hl, +-hw) rotated into world frame
    lx = jnp.stack([hl, hl, -hl, -hl], axis=-1)
    ly = jnp.stack([hw, -hw, -hw, hw], axis=-1)
    cx = x[..., None] + lx * c[..., None] - ly * s[..., None]
    cy = y[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _sat_penetration(state_a, size_a, state_b, size_b):
    """SAT penetration depth between two OBBs (scalars per trailing batch).

    Tests the 4 candidate axes (2 per box). Returns >= 0; 0 iff separated.
    """
    # broadcast both operands to a common batch shape
    batch = jnp.broadcast_shapes(state_a.shape[:-1], state_b.shape[:-1])
    state_a = jnp.broadcast_to(state_a, batch + state_a.shape[-1:])
    state_b = jnp.broadcast_to(state_b, batch + state_b.shape[-1:])
    size_a = jnp.broadcast_to(size_a, batch + size_a.shape[-1:])
    size_b = jnp.broadcast_to(size_b, batch + size_b.shape[-1:])
    ca = jnp.stack([state_a[..., 0], state_a[..., 1]], axis=-1)
    cb = jnp.stack([state_b[..., 0], state_b[..., 1]], axis=-1)
    d = cb - ca

    def axes(psi):
        c, s = jnp.cos(psi), jnp.sin(psi)
        return jnp.stack([jnp.stack([c, s], axis=-1),
                          jnp.stack([-s, c], axis=-1)], axis=-2)  # (..., 2, 2)

    ax_a = axes(state_a[..., 2])
    ax_b = axes(state_b[..., 2])
    all_axes = jnp.concatenate([ax_a, ax_b], axis=-2)  # (..., 4, 2)

    def half_extent(axis, box_axes, size):
        # projection radius of an OBB onto a unit axis
        hl, hw = size[..., 0] / 2.0, size[..., 1] / 2.0
        pa = jnp.abs(jnp.einsum("...kd,...d->...k", box_axes, axis))  # (...,2)
        return hl * pa[..., 0] + hw * pa[..., 1]

    def overlap_on(axis):
        ra = half_extent(axis, ax_a, size_a)
        rb = half_extent(axis, ax_b, size_b)
        dist = jnp.abs(jnp.einsum("...d,...d->...", d, axis))
        return ra + rb - dist

    overlaps = jnp.stack([overlap_on(all_axes[..., k, :]) for k in range(4)], axis=-1)
    return jnp.maximum(jnp.min(overlaps, axis=-1), 0.0)


def pairwise_collision(states: jnp.ndarray, sizes: jnp.ndarray,
                       present: jnp.ndarray) -> jnp.ndarray:
    """All-pairs penetration depths.

    states: (A, 4); sizes: (A, 2); present: (A,) bool. Returns (A, A) with
    zeros on the diagonal and for absent pairs.
    """
    a = states.shape[0]
    pen = _sat_penetration(states[:, None, :], sizes[:, None, :],
                           states[None, :, :], sizes[None, :, :])
    mask = present[:, None] & present[None, :] & ~jnp.eye(a, dtype=bool)
    return jnp.where(mask, pen, 0.0)


def ego_collision(states: jnp.ndarray, sizes: jnp.ndarray,
                  present: jnp.ndarray, ego_index: int = 0) -> jnp.ndarray:
    """Max penetration of the ego box against all other present agents.

    Matches the exposed-agent semantics of the reference: the IAI wrapper
    exposes only the ego, so `compute_collision()` is a single scalar
    (reference gym_env.py:415 `.item()`). O(A), not O(A^2).
    """
    ego_state = states[ego_index]
    ego_size = sizes[ego_index]
    pen = _sat_penetration(ego_state[None, :], ego_size[None, :], states, sizes)
    mask = present & (jnp.arange(states.shape[0]) != ego_index) & present[ego_index]
    return jnp.max(jnp.where(mask, pen, 0.0))


# -- disc approximation (torchdrivesim CollisionMetric.discs) ----------------

N_DISCS = 5


def _disc_centers(states: jnp.ndarray, sizes: jnp.ndarray) -> jnp.ndarray:
    """Disc-decomposed body: N_DISCS circles of radius width/2 with centers
    spaced along the body axis so the union covers the box length
    (torchdrivesim's discs metric approximates each agent this way).
    states (..., 4), sizes (..., 2) -> centers (..., N_DISCS, 2)."""
    x, y, psi = states[..., 0], states[..., 1], states[..., 2]
    hl, hw = sizes[..., 0] / 2.0, sizes[..., 1] / 2.0
    span = jnp.maximum(hl - hw, 0.0)                 # centers stay inside
    t = jnp.linspace(-1.0, 1.0, N_DISCS)
    off = span[..., None] * t                        # (..., N)
    cx = x[..., None] + off * jnp.cos(psi)[..., None]
    cy = y[..., None] + off * jnp.sin(psi)[..., None]
    return jnp.stack([cx, cy], axis=-1)


def ego_collision_discs(states: jnp.ndarray, sizes: jnp.ndarray,
                        present: jnp.ndarray, ego_index: int = 0
                        ) -> jnp.ndarray:
    """Disc-approximation penetration of the ego against all present agents
    (torchdrivesim `CollisionMetric.discs`; selected via
    TorchDriveConfig.collision_metric, reference gym_env.py:48). Cheaper and
    smoother than SAT but conservative at box corners; only `> 0` matters
    for the env's termination semantics."""
    ego_c = _disc_centers(states[ego_index], sizes[ego_index])   # (N, 2)
    ego_r = sizes[ego_index, 1] / 2.0
    all_c = _disc_centers(states, sizes)                          # (A, N, 2)
    all_r = sizes[:, 1] / 2.0                                     # (A,)
    d = jnp.linalg.norm(ego_c[None, :, None, :] - all_c[:, None, :, :],
                        axis=-1)                                  # (A, N, N)
    pen = jnp.maximum(ego_r + all_r[:, None, None] - d, 0.0)
    mask = present & (jnp.arange(states.shape[0]) != ego_index) \
        & present[ego_index]
    return jnp.max(jnp.where(mask[:, None, None], pen, 0.0))
