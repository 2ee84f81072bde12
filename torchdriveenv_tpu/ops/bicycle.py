"""Kinematic bicycle integrator.

Replaces torchdrivesim's `KinematicBicycle` as consumed by the reference env
(reference gym_env.py:17,245-247: `set_params(lr=rear_axis_offset)`,
`set_state(B x A x 4)`, integrating `(acceleration, steering)` at dt=0.1 s).

Model: the standard single-track kinematic bicycle with the reference point at
the body center and the slip angle of the center-of-mass form
(Kong et al. 2015, "Kinematic and dynamic vehicle models for autonomous
driving control design"):

    beta = atan(beta_factor * tan(steering))
    x'   = v * cos(psi + beta)
    y'   = v * sin(psi + beta)
    psi' = v * sin(beta) / lr
    v'   = a

`beta_factor` is lr / (lf + lr); the default 0.5 (lf == lr, reference point
at the body center) is the PINNED FINAL value (DESIGN.md "Kinematic bicycle
discretization"): tds 6c7957c is not vendored, offline verification is
impossible, and the reference's bundled data cannot discriminate the
discretization — 0.5 is the consistent choice given the env treats [x, y]
as the box center everywhere (collision, render, waypoints; reference
consumes tds at gym_env.py:245-247). It remains configurable
(TorchDriveConfig.bicycle_beta_factor); the committed golden trajectories
(tools/golden_trajectories.py) pin the semantics so changing it is an
explicit, visible re-record.

State layout `[x, y, psi, speed]` matches the reference (gym_env.py:371-375).
Pure function, broadcasts over any leading batch/agent dims, vmap/scan safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def bicycle_step(state: jnp.ndarray, action: jnp.ndarray, lr: jnp.ndarray,
                 dt: float = 0.1, beta_factor: float = 0.5) -> jnp.ndarray:
    """Integrate one step (explicit Euler at dt).

    state:  (..., 4) [x, y, psi, speed]
    action: (..., 2) [acceleration (m/s^2), steering (rad, front wheel)]
    lr:     (...) distance from body center to rear axle (m)
    beta_factor: slip ratio lr / (lf + lr); 0.5 = center-of-mass reference
    """
    x, y, psi, v = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    a, steer = action[..., 0], action[..., 1]
    lr = jnp.maximum(lr, 1e-3)
    beta = jnp.arctan(beta_factor * jnp.tan(steer))
    x = x + v * jnp.cos(psi + beta) * dt
    y = y + v * jnp.sin(psi + beta) * dt
    psi = psi + v * jnp.sin(beta) / lr * dt
    v = v + a * dt
    return jnp.stack([x, y, psi, v], axis=-1)
