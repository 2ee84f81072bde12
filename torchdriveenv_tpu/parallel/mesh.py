"""Device mesh + sharding helpers.

Design (see DESIGN.md §7 / SURVEY.md §2.4): a 1-D mesh axis ``env`` carries
env-batch data parallelism — the natural axis for an RL environment framework
whose computation is thousands of independent env instances plus a
data-parallel learner. Params/assets are replicated; every batched tensor is
sharded on its leading axis. XLA/GSPMD then partitions the whole fused
rollout+update program, inserting `psum` (gradient all-reduce) over ICI.

Multi-host: the same annotations scale to a multi-host mesh
(`jax.distributed.initialize` + all devices); nothing here is
host-count-dependent.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "env") -> Mesh:
    """1-D mesh over all (or given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Sharding for batched env data: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for params/assets: replicated on every device."""
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis_name: str = "env") -> Any:
    """Place a pytree of batched arrays with the leading axis sharded.

    Scalars/0-d leaves are replicated.
    """
    s_env = env_sharding(mesh, axis_name)
    s_rep = replicated(mesh)

    def place(x):
        x = jax.numpy.asarray(x)
        return jax.device_put(x, s_env if x.ndim >= 1 else s_rep)

    return jax.tree.map(place, tree)
