"""Host/device-count invariance of sharded execution (BASELINE.md scaling
row; SURVEY.md §2.4 TPU-equivalents).

RNG streams are per-env (one key column per env threaded through
reset/step), so the same seeded batch must produce bitwise-identical
trajectories whether it runs replicated on one device or split 1x8 over the
mesh's env axis — sharding is a placement annotation, not a semantic one.
The conftest provides the 8-device virtual CPU mesh.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.parallel.mesh import (
    env_sharding,
    make_mesh,
    replicated,
    shard_carry,
)


NUM_ENVS = 8


def _rollout(cfg, assets, sharded: bool, steps: int = 6):
    reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    keys = jax.random.split(jax.random.PRNGKey(3), NUM_ENVS)
    state, obs = jax.jit(reset_fn)(keys)
    if sharded:
        mesh = make_mesh(jax.devices())
        state = shard_carry(state, mesh, NUM_ENVS)
        assets = jax.device_put(assets, replicated(mesh))
        obs = jax.device_put(obs, env_sharding(mesh))
        reset_fn, step_fn = make_env_fns(cfg, assets, render=True)
    step_j = jax.jit(step_fn)
    traj = []
    actions = jnp.tile(jnp.array([[0.4, 0.05]]), (NUM_ENVS, 1))
    for _ in range(steps):
        out = step_j(state, actions)
        state = out.state
        traj.append((np.asarray(out.reward), np.asarray(out.obs),
                     np.asarray(out.state.agent_states),
                     np.asarray(out.terminated)))
    return traj


@pytest.mark.parametrize("ego_only", [True, False])
def test_sharded_matches_replicated(assets_val, ego_only):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg = EnvConfig(ego_only=ego_only, reset_pool=0)
    ref = _rollout(cfg, assets_val, sharded=False)
    shd = _rollout(cfg, assets_val, sharded=True)
    for t, (a, b) in enumerate(zip(ref, shd)):
        (r0, o0, s0, t0), (r1, o1, s1, t1) = a, b
        # partitioned compilation may fuse differently (fma contraction),
        # so float leaves get a tight tolerance rather than bitwise; the
        # discrete outcomes (termination, rendered pixels) must agree except
        # for boundary pixels of sub-1e-4-jittered agents.
        np.testing.assert_allclose(s1, s0, atol=1e-3, rtol=1e-5,
                                   err_msg=f"step {t} states")
        np.testing.assert_allclose(r1, r0, atol=1e-4,
                                   err_msg=f"step {t} reward")
        np.testing.assert_array_equal(t1, t0, err_msg=f"step {t} term")
        pix_diff = (o1 != o0).mean()
        assert pix_diff < 1e-3, f"step {t}: {pix_diff:.2%} obs pixels differ"


@pytest.mark.slow
def test_two_process_distributed_matches_single(assets_val, tmp_path):
    """True multi-process `jax.distributed` run (SURVEY §4): two OS processes
    x 4 virtual CPU devices each form one 8-device global mesh via
    `maybe_init_distributed`, step a sharded env batch, and the gathered
    trajectory (via `fetch_to_host`'s process_allgather path) must match a
    single-process run of the same seeds."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:                 # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "distributed_worker.py")
    out_npz = str(tmp_path / "traj.npz")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env.update(JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, worker, out_npz], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    assert "WORKER0_DONE" in outs[0] + outs[1]

    # single-process reference with identical seeds/config
    cfg = EnvConfig(ego_only=True, reset_pool=0)
    ref = _rollout(cfg, assets_val, sharded=False, steps=4)
    got = np.load(out_npz)
    for t in range(4):
        np.testing.assert_allclose(
            got["states"][t], ref[t][2], atol=1e-3, rtol=1e-5,
            err_msg=f"step {t} states diverge from single-process run")
        np.testing.assert_allclose(got["rewards"][t], ref[t][0], atol=1e-4)


def test_train_step_runs_sharded(assets_val):
    """One fused SAC rollout+update step executes with the carry sharded
    over the 8-device mesh (the train CLI placement path, rl/train.py)."""
    from torchdriveenv_tpu.parallel.train_step import make_offpolicy_train_fns
    from torchdriveenv_tpu.rl.sac import SAC, SACConfig

    cfg = EnvConfig(reset_pool=0)
    agent = SAC(SACConfig(batch_size=8, learning_starts=0))
    init_fn, train_fn = make_offpolicy_train_fns(
        cfg, agent, num_envs=NUM_ENVS, buffer_capacity=16,
        steps_per_iter=1, updates_per_iter=1)
    carry = jax.jit(init_fn)(assets_val, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices())
    carry = shard_carry(carry, mesh, NUM_ENVS)
    assets = jax.device_put(assets_val, replicated(mesh))
    carry2, metrics = jax.jit(train_fn)(assets, carry)
    jax.block_until_ready(metrics)
    assert int(np.asarray(carry2.env_steps)) == NUM_ENVS
    # params stayed replicated; buffer stayed env-sharded
    ashard = jax.tree.leaves(carry2.agent_state)[0].sharding
    assert ashard.is_fully_replicated
    bshard = carry2.buffer.frames.sharding
    assert not bshard.is_fully_replicated
