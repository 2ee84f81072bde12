"""Training driver CLI — reference `examples/rl_training.py` equivalent.

Usage:
    python -m torchdriveenv_tpu.rl.train --config_file path/to/config.yml
    python -m torchdriveenv_tpu.rl.train --algorithm sac --total_timesteps 1e5

Loads the same YAML schema as the reference (RlTrainingConfig; reference
examples/common.py:29-47, env_configs/*.yml load unchanged), builds the
jitted rollout+learner program for the chosen algorithm, and runs:
  - periodic eval on the validation suite AND the training suite, recording
    the 9-metric benchmark set (reference rl_training.py:99-108),
  - metric logging to stdout + JSONL (+ TensorBoard if available),
  - Orbax checkpointing of the FULL train state (params, opt state, env
    states, replay buffer, PRNG keys) for resumable runs — the reference
    only saves model weights via wandb (rl_training.py:210-215).

Env parallelism: `parallel_env_num` envs as one sharded batch axis over all
local devices (reference: N OS processes, rl_training.py:159).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.config import (
    BaselineAlgorithm,
    RlTrainingConfig,
    load_rl_training_config,
)
from torchdriveenv_tpu.env.batched import make_env_fns
from torchdriveenv_tpu.maps.arrays import load_assets
from torchdriveenv_tpu.models.policies import scale_action
from torchdriveenv_tpu.parallel.train_step import (
    make_offpolicy_train_fns,
    make_onpolicy_train_fns,
)
from torchdriveenv_tpu.rl.evaluate import make_evaluator
from torchdriveenv_tpu.rl.rollout import init_stack, update_stack
from torchdriveenv_tpu.utils.video import save_video


def _flatten_cfg(cfg, prefix="") -> dict:
    """Flatten the config tree for wandb (reference rl_training.py:151-157
    flattens env-* / tds-* prefixes the same way)."""
    import dataclasses
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out.update(_flatten_cfg(v, prefix=f"{prefix}{f.name}-"))
        else:
            out[f"{prefix}{f.name}"] = getattr(v, "value", v)
    return out


def build_agent(algo: BaselineAlgorithm, obs_channels: int,
                algo_kwargs: Optional[dict] = None):
    """algo_kwargs overrides fields of the algorithm's config dataclass —
    the TPU-scale knob (e.g. PPO n_steps/batch_size shrink/grow with the
    env count; the reference hard-codes SB3 kwargs, rl_training.py:166-183)."""
    kw = dict(algo_kwargs or {})
    if algo == BaselineAlgorithm.sac:
        from torchdriveenv_tpu.rl.sac import SAC, SACConfig
        return SAC(SACConfig(**kw), obs_channels), False
    if algo == BaselineAlgorithm.td3:
        from torchdriveenv_tpu.rl.td3 import TD3, TD3Config
        return TD3(TD3Config(**kw), obs_channels), False
    if algo == BaselineAlgorithm.ppo:
        from torchdriveenv_tpu.rl.ppo import PPO, PPOConfig
        return PPO(PPOConfig(**kw), obs_channels), True
    if algo == BaselineAlgorithm.a2c:
        from torchdriveenv_tpu.rl.a2c import A2C, A2CConfig
        return A2C(A2CConfig(**kw), obs_channels), True
    raise ValueError(f"unknown algorithm {algo}")


class MetricLogger:
    """stdout + JSONL (+ TensorBoard / wandb when importable) metrics sink.

    wandb parity (reference rl_training.py:145-157): if the wandb package is
    importable the run is initialized with the flattened config; otherwise
    logging silently degrades to JSONL/TB — no network dependency.
    """

    def __init__(self, log_dir: str, run_name: str, wandb_config: dict = None,
                 project: str = "torchdriveenv_tpu"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        self._wandb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(log_dir, run_name))
        except Exception:
            pass
        try:
            import wandb
            self._wandb = wandb.init(
                project=project, name=run_name,
                mode=os.environ.get("WANDB_MODE", "offline"),
                config=wandb_config or {})
        except Exception:
            self._wandb = None

    def log(self, step: int, metrics: dict, prefix: str = ""):
        # one batched device->host transfer for the whole dict: per-scalar
        # np.asarray fetches are a ~12 ms tunnel round-trip EACH, which at
        # 9+ metrics per iteration dominated the r4 scale-SAC loop (the
        # measured "learner-bound ~330 env-steps/s" was host logging;
        # artifacts/bench_r05_learner_breakdown.json has the real learner
        # numbers)
        metrics = jax.device_get(metrics)
        flat = {f"{prefix}{k}": float(np.asarray(v))
                for k, v in metrics.items()}
        self._f.write(json.dumps({"step": step, **flat}) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(flat, step=step)
        print(f"[{step}] " + " ".join(f"{k}={v:.4g}" for k, v in flat.items()),
              flush=True)


class _NullLogger:
    """Metrics sink for non-zero processes: multi-host runs must not have
    every host writing the same JSONL/TB/wandb streams (corruption) — all
    file output is gated on `jax.process_index() == 0`."""

    path = None

    def log(self, step, metrics, prefix=""):
        pass


def save_checkpoint(ckpt_dir: str, name, carry):
    """Full-carry checkpoint (params+opt+buffer+env states+keys) — rare.

    The replay buffer makes a full carry ~GBs; the frequent artifact is the
    small model-only save (`save_model`), matching the reference's wandb
    model_save_freq behavior (rl_training.py:210-215).

    Multi-host: `fetch_to_host` allgathers host-sharded leaves (collective —
    runs on every process); only process 0 writes. NOTE: on a pod,
    `checkpoint_dir` must be on a shared filesystem (GCS/NFS) — restore
    (`--resume_from`) reads the same path on every process. The full-carry
    allgather moves the whole replay buffer to every host; it runs only at
    the rare `snapshot_every` cadence (the frequent artifact is the small
    model-only `save_model`)."""
    from torchdriveenv_tpu.parallel.mesh import fetch_to_host
    host_carry = fetch_to_host(carry)
    if jax.process_index() != 0:
        return
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, str(name)))
    ocp.PyTreeCheckpointer().save(path, host_carry, force=True)


def save_model(ckpt_dir: str, step: int, agent_state):
    """Model-only save (few MB): reference wandb model_save_freq analogue.

    agent_state is replicated under the data-parallel sharding, so every
    host holds a full copy; process 0 alone writes it."""
    from torchdriveenv_tpu.parallel.mesh import fetch_to_host
    host_state = fetch_to_host(agent_state)
    if jax.process_index() != 0:
        return
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"model_{step}"))
    ocp.PyTreeCheckpointer().save(path, host_state, force=True)


def restore_checkpoint(path: str, carry_like):
    import orbax.checkpoint as ocp
    restored = ocp.PyTreeCheckpointer().restore(
        os.path.abspath(path), item=jax.device_get(carry_like))
    return jax.tree.map(jnp.asarray, restored)


def train(cfg: RlTrainingConfig, resume_from: Optional[str] = None,
          max_wall_s: Optional[float] = None,
          init_model: Optional[str] = None):
    """`resume_from` restores a FULL carry (same env count / buffer shape);
    `init_model` warm-starts only the agent state (params/opt/alpha) from a
    model-only save — the cross-scale path (e.g. continue a 10-env
    reference-recipe policy at 128 envs, where the carry shapes differ)."""
    algo = cfg.algorithm or BaselineAlgorithm.sac
    env_cfg = cfg.env
    num_envs = cfg.parallel_env_num
    fs = env_cfg.frame_stack
    agent, on_policy = build_agent(algo, obs_channels=3 * fs,
                                   algo_kwargs=cfg.algo_kwargs)

    run_name = f"{algo.value}-{int(time.time())}"
    is_main = jax.process_index() == 0
    logger = (MetricLogger(cfg.log_dir, run_name,
                           wandb_config=_flatten_cfg(cfg), project=cfg.project)
              if is_main else _NullLogger())
    train_assets = load_assets("train")
    val_assets = load_assets("val")

    if on_policy:
        init_fn, train_fn = make_onpolicy_train_fns(env_cfg, agent, num_envs)
        steps_per_iter = agent.cfg.n_steps * num_envs
    else:
        # SB3 default train_freq=1: one gradient step per lockstep env step
        env_steps_per_iter = cfg.offpolicy_steps_per_iter
        demo_fn = None
        if cfg.demo_warmup_steps or cfg.demo_envs:
            from torchdriveenv_tpu.rl.demo import make_scripted_driver
            demo_fn = make_scripted_driver(env_cfg, train_assets)
        init_fn, train_fn = make_offpolicy_train_fns(
            env_cfg, agent, num_envs,
            buffer_capacity=max(agent.cfg.buffer_size // num_envs, 256),
            steps_per_iter=env_steps_per_iter,
            updates_per_iter=cfg.offpolicy_updates_per_iter,
            demo_fn=demo_fn, demo_steps=cfg.demo_warmup_steps,
            demo_envs=cfg.demo_envs)
        steps_per_iter = env_steps_per_iter * num_envs

    carry = jax.jit(init_fn)(train_assets, jax.random.PRNGKey(
        env_cfg.seed if env_cfg.seed is not None else 0))
    if resume_from:
        carry = restore_checkpoint(resume_from, carry)
    elif init_model:
        carry = carry.replace(agent_state=restore_checkpoint(
            init_model, carry.agent_state))

    # data-parallel placement over all local (or, under jax.distributed, all
    # global) devices: env-batched leaves sharded, learner replicated; GSPMD
    # inserts the gradient all-reduce. Single device -> trivial 1-mesh.
    devices = jax.devices()
    if len(devices) > 1 and num_envs % len(devices) == 0:
        from torchdriveenv_tpu.parallel.mesh import make_mesh, shard_carry
        mesh = make_mesh(devices)
        carry = shard_carry(carry, mesh, num_envs)
        from torchdriveenv_tpu.parallel.mesh import replicated
        train_assets = jax.device_put(train_assets, replicated(mesh))
        print(f"sharded over {len(devices)} devices "
              f"({jax.process_count()} hosts)", flush=True)
    train_step = jax.jit(train_fn, donate_argnums=(1,))

    # --- evaluators (reference rl_training.py:185-203); `deterministic`
    # honored from RlCallbackConfig (reference common.py:19)
    def make_eval(assets, n_episodes, deterministic, per_case=False):
        reset_fn, step_fn = make_env_fns(env_cfg, assets, render=True)

        def policy(agent_state, stack):
            out = agent.select_action(agent_state, stack,
                                      jax.random.PRNGKey(0),
                                      deterministic=deterministic)
            return out[0] if isinstance(out, tuple) else out

        # per_case: round-robin fixed cases so the log carries
        # eval/success_case_{i} for each of the (5) named validation cases
        cases = n_cases = None
        if per_case:
            n_cases = int(assets.suite.case_town.shape[0])
            n_episodes = max(n_episodes, n_cases)
            cases = np.arange(n_episodes) % n_cases
        ev = make_evaluator(reset_fn, step_fn, policy, fs, scale_action,
                            max_steps=env_cfg.max_environment_steps,
                            cases=cases, n_cases=n_cases)
        return jax.jit(lambda key, agent_state: ev(
            jax.random.split(key, n_episodes), agent_state))

    n_ep = max(cfg.eval_val_callback.eval_n_episodes, 1)
    eval_val = make_eval(val_assets, n_ep,
                         cfg.eval_val_callback.deterministic, per_case=True)
    eval_train = make_eval(train_assets,
                           max(cfg.eval_train_callback.eval_n_episodes, 1),
                           cfg.eval_train_callback.deterministic)

    # --- eval video recorder (reference VecVideoRecorder, rl_training.py:162)
    video_dir = os.path.join(cfg.log_dir, run_name + "_videos")
    record_video = None
    if cfg.eval_val_callback.record:
        reset_v, step_v = make_env_fns(env_cfg, val_assets, render=True)

        def _video_rollout(key, agent_state):
            state, obs = reset_v(key[None])
            stack = init_stack(obs, fs)

            def one(c, _):
                state, stack = c
                out = agent.select_action(agent_state, stack,
                                          jax.random.PRNGKey(0),
                                          deterministic=True)
                a = out[0] if isinstance(out, tuple) else out
                o = step_v(state, scale_action(a))
                return (o.state, update_stack(stack, o.obs,
                                              o.terminated | o.truncated)), o.obs
            _, frames = jax.lax.scan(
                one, (state, stack), None,
                length=env_cfg.max_environment_steps)
            return frames[:, 0]                      # (T, 3, res, res)

        _video_jit = jax.jit(_video_rollout)

        def record_video(step, key, agent_state):
            # runs on every process (jit over global arrays is collective);
            # only process 0 writes the file
            from torchdriveenv_tpu.parallel.mesh import fetch_to_host
            frames = fetch_to_host(_video_jit(key, agent_state))
            if not is_main:
                return
            os.makedirs(video_dir, exist_ok=True)
            save_video(list(np.asarray(frames)),
                       os.path.join(video_dir, f"eval_{step}.avi"))

    total = int(cfg.total_timesteps)
    eval_every = max(cfg.eval_val_callback.n_steps, steps_per_iter)
    model_save_every = max(cfg.wandb_callback.model_save_freq, steps_per_iter)
    snapshot_every = (max(cfg.full_snapshot_every, model_save_every)
                      if cfg.full_snapshot_every > 0 else None)
    if cfg.full_snapshot_every < 0:
        print("full snapshots disabled (full_snapshot_every < 0): "
              "--resume_from will have nothing to restore from this run",
              flush=True)
    video_every = eval_every * 10
    log_every_iters = max(1, 1000 // steps_per_iter)
    ckpt_dir = cfg.checkpoint_dir or os.path.join("models", run_name)

    env_steps = int(np.asarray(carry.env_steps))
    next_eval = 0
    next_model = model_save_every
    next_snapshot = snapshot_every if snapshot_every else float("inf")
    next_video = 0
    t_start = time.time()
    k_eval = jax.random.PRNGKey(10_000)
    iters = 0
    metrics = None

    pending_log = None    # (step, device-metrics) deferred one iteration
    while env_steps < total:
        if max_wall_s is not None and time.time() - t_start > max_wall_s:
            print("wall-clock budget reached", flush=True)
            break
        carry, metrics = train_step(train_assets, carry)
        env_steps += steps_per_iter          # host-side mirror of carry.env_steps
        iters += 1
        # flush the PREVIOUS iteration's metrics now that the next step is
        # dispatched: the device->host fetch (a tunnel round-trip) overlaps
        # the in-flight train step instead of stalling the device
        if pending_log is not None:
            logger.log(*pending_log, prefix="train/")
            pending_log = None
        if iters % log_every_iters == 0:
            m = dict(metrics)
            m["env_steps_per_s"] = env_steps / (time.time() - t_start)
            pending_log = (env_steps, m)

        if env_steps >= next_eval:
            next_eval = env_steps + eval_every
            k_eval, k1, k2 = jax.random.split(k_eval, 3)
            logger.log(env_steps, eval_val(k1, carry.agent_state),
                       prefix="eval/")
            logger.log(env_steps, eval_train(k2, carry.agent_state),
                       prefix="eval_train/")
        if record_video is not None and env_steps >= next_video:
            next_video = env_steps + video_every
            k_eval, kv = jax.random.split(k_eval)
            record_video(env_steps, kv, carry.agent_state)
        if env_steps >= next_model:
            next_model = env_steps + model_save_every
            # named per-step model saves (few MB each) — the reference's
            # wandb model_save_freq keeps every save too (rl_training.py:210)
            save_model(ckpt_dir, env_steps, carry.agent_state)
        if env_steps >= next_snapshot:
            next_snapshot = env_steps + snapshot_every
            save_model(ckpt_dir, env_steps, carry.agent_state)
            save_checkpoint(ckpt_dir, "full_latest", carry)

    if pending_log is not None:
        logger.log(*pending_log, prefix="train/")
    save_model(ckpt_dir, env_steps, carry.agent_state)
    if cfg.full_snapshot_every >= 0:
        save_checkpoint(ckpt_dir, "full_latest", carry)
    return carry


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config_file", type=str, default=None)
    ap.add_argument("--algorithm", type=str, default=None)
    ap.add_argument("--total_timesteps", type=float, default=None)
    ap.add_argument("--parallel_env_num", type=int, default=None)
    ap.add_argument("--resume_from", type=str, default=None)
    ap.add_argument("--init_model", type=str, default=None,
                    help="warm-start agent state from a model-only save "
                    "(cross-env-count, unlike --resume_from)")
    ap.add_argument("--max_wall_s", type=float, default=None)
    args = ap.parse_args()

    from torchdriveenv_tpu.parallel.mesh import maybe_init_distributed
    maybe_init_distributed()

    if args.config_file:
        cfg = load_rl_training_config(args.config_file)
    else:
        cfg = RlTrainingConfig()
    if args.algorithm:
        cfg.algorithm = BaselineAlgorithm(args.algorithm)
    if args.total_timesteps is not None:
        cfg.total_timesteps = int(args.total_timesteps)
    if args.parallel_env_num is not None:
        cfg.parallel_env_num = args.parallel_env_num
    train(cfg, resume_from=args.resume_from, max_wall_s=args.max_wall_s,
          init_model=args.init_model)


if __name__ == "__main__":
    main()
