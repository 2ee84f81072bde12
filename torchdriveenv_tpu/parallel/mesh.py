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


def shard_carry(carry: Any, mesh: Mesh, num_envs: int,
                axis_name: str = "env") -> Any:
    """Place a train-loop carry for data-parallel execution: every leaf whose
    leading axis is the env batch is split over the mesh's env axis, all
    other leaves (params, optimizer state, scalars, PRNG keys) replicated.
    GSPMD propagates these input shardings through the fused rollout+learner
    program and inserts the gradient all-reduce (`psum` over ICI)."""
    s_env = env_sharding(mesh, axis_name)
    s_rep = replicated(mesh)

    def place(x):
        batched = (hasattr(x, "ndim") and x.ndim >= 1
                   and x.shape[0] == num_envs)
        return jax.device_put(x, s_env if batched else s_rep)

    return jax.tree.map(place, carry)


_distributed_initialized = False


def maybe_init_distributed() -> bool:
    """Multi-host entry (SURVEY.md §2.4): initialize the JAX distributed
    runtime when a coordinator is configured via environment
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), or —
    opt-in via TDE_DISTRIBUTED=1 — under a multi-task SLURM job (auto-detect).
    Safe no-op on a single host with none of these set.

    MUST run before any other jax API call: touching a backend (even
    `jax.process_count()`) initializes XLA, after which
    `jax.distributed.initialize` raises. Re-entry is guarded by a module
    flag, not a jax query, for the same reason. Returns True when the
    distributed runtime is (already) initialized."""
    import os

    global _distributed_initialized
    if _distributed_initialized:
        return True
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    slurm = (os.environ.get("TDE_DISTRIBUTED", "") == "1"
             and os.environ.get("SLURM_NTASKS", "1") not in ("", "1"))
    if not addr and not slurm:
        return False
    try:
        if addr:
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]))
        else:
            jax.distributed.initialize()     # SLURM auto-detect (opt-in)
    except RuntimeError as e:
        # already initialized by the caller — a documented no-op. JAX's
        # message is "jax.distributed.initialize should only be called once";
        # anything else (e.g. backends already touched) is surfaced loudly
        # instead of silently running single-host.
        msg = str(e).lower()
        if "only be called once" not in msg and "already" not in msg:
            raise
    _distributed_initialized = True
    return True


def fetch_to_host(tree: Any) -> Any:
    """Pytree → host numpy, safe under multi-host sharding.

    `jax.device_get` fails on globally-sharded arrays whose shards live on
    other hosts; those leaves are gathered with
    `multihost_utils.process_allgather` instead (a collective — call this on
    EVERY process, then let process 0 alone write the result to disk).
    Single-process (incl. the virtual-device CPU mesh) is plain device_get."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    return jax.tree.map(fetch, tree)


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
