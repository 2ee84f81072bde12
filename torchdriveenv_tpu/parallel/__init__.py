"""Multi-chip scaling: device mesh, sharded rollout + data-parallel learner.

The reference's only parallelism is N OS processes with pipe transport
(``SubprocVecEnv``, reference examples/rl_training.py:159). The TPU-native
equivalent: envs are a sharded batch axis of one jitted program over a
`jax.sharding.Mesh`; the learner is data-parallel with XLA inserting the
gradient all-reduce over ICI (GSPMD), no explicit comm library.
"""

from torchdriveenv_tpu.parallel.mesh import (
    env_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = ["make_mesh", "env_sharding", "replicated", "shard_batch"]
