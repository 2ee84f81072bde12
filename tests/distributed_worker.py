"""Worker for the 2-process `jax.distributed` test (SURVEY.md §4 multi-host
testing requirement; VERDICT r2 next-step #5b).

Launched as a subprocess by tests/test_multihost.py with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 4
virtual CPU devices per process (8 global). Drives the REAL multi-host entry
points — `maybe_init_distributed` before any jax API touch, global-mesh
sharding via `shard_carry`, and `fetch_to_host`'s process_allgather path —
then process 0 writes the trajectory for the parent to compare against a
single-process run.

Usage: python distributed_worker.py <out_npz_path>
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image pre-imports jax at interpreter start (platform plugin hook), so
# the env var above can be latched too late — force via the config API, which
# works any time before first backend initialization (same trick as
# tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# CRITICAL ORDER: the distributed runtime must come up before any other jax
# call initializes the XLA backends (ADVICE r2 high finding).
from torchdriveenv_tpu.parallel.mesh import maybe_init_distributed  # noqa: E402

assert maybe_init_distributed(), "coordinator env vars should trigger init"
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from torchdriveenv_tpu.config import EnvConfig  # noqa: E402
from torchdriveenv_tpu.env.batched import make_env_fns  # noqa: E402
from torchdriveenv_tpu.maps.arrays import load_assets  # noqa: E402
from torchdriveenv_tpu.parallel.mesh import (  # noqa: E402
    fetch_to_host,
    make_mesh,
    replicated,
    shard_carry,
)

NUM_ENVS = 8
STEPS = 4


def main():
    out_path = sys.argv[1]
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    cfg = EnvConfig(ego_only=True, reset_pool=0)
    assets = load_assets("val")
    mesh = make_mesh(jax.devices())          # global 8-device mesh

    reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    keys = jax.random.split(jax.random.PRNGKey(3), NUM_ENVS)
    state, obs = jax.jit(reset_fn)(keys)
    state = shard_carry(state, mesh, NUM_ENVS)   # env axis over both hosts
    assets = jax.device_put(assets, replicated(mesh))
    reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    step_j = jax.jit(step_fn)

    actions = jnp.tile(jnp.array([[0.4, 0.05]]), (NUM_ENVS, 1))
    states, rewards = [], []
    for _ in range(STEPS):
        out = step_j(state, actions)
        state = out.state
        # cross-host sharded leaves -> allgather path of fetch_to_host
        states.append(fetch_to_host(out.state.agent_states))
        rewards.append(fetch_to_host(out.reward))

    if jax.process_index() == 0:
        np.savez(out_path,
                 states=np.stack(states), rewards=np.stack(rewards))
        print("WORKER0_DONE", flush=True)
    else:
        print("WORKER1_DONE", flush=True)


if __name__ == "__main__":
    main()
