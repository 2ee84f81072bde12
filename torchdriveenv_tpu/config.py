"""Configuration tree.

Mirrors the reference's layered dataclass + YAML config system
(reference: torchdriveenv/gym_env.py:34-54 ``EnvConfig``,
examples/common.py:16-47 ``RlTrainingConfig``/callback configs) so existing
experiment YAMLs (examples/env_configs/*.yml) load unchanged, while adding
TPU-native knobs (batch size, mesh shape, dtype policy).

No OmegaConf dependency: plain PyYAML + dataclass construction.
"""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class RendererConfig:
    """Reference: torchdrivesim RendererConfig consumed at gym_env.py:46-47."""

    left_handed_coordinates: bool = True
    highlight_ego_vehicle: bool = True
    # TPU-native knobs
    obs_res: int = 64          # observation resolution (reference obs 3x64x64, gym_env.py:95)
    obs_fov: float = 70.0      # meters visible across the observation window
    render_waypoints: bool = True
    render_traffic_lights: bool = True
    backend: str = "auto"      # "pallas" (TPU kernel) | "xla" twin | "auto"


class CollisionMetric(str, enum.Enum):
    """Reference: torchdrivesim CollisionMetric, used at gym_env.py:48."""

    nograd = "nograd"
    discs = "discs"


@dataclass
class TorchDriveConfig:
    """Simulator-level config (reference: TorchDriveConfig at gym_env.py:46-49)."""

    renderer: RendererConfig = field(default_factory=RendererConfig)
    collision_metric: CollisionMetric = CollisionMetric.nograd
    left_handed_coordinates: bool = True
    # TPU-native knobs
    max_agents: int = 96       # padded agent capacity (reference caps <100, gym_env.py:216)
    dt: float = 0.1            # reference runs at 10 fps (gym_env.py:75)
    # Kinematic-bicycle slip ratio lr/(lf+lr). 0.5 (lf == lr) is an assumed
    # discretization of tds KinematicBicycle (see ops/bicycle.py docstring);
    # adjustable so the pinned tds 6c7957c behavior can be matched exactly
    # when verified.
    bicycle_beta_factor: float = 0.5


@dataclass
class EnvConfig:
    """Reference: torchdriveenv/gym_env.py:34-54, field-for-field."""

    ego_only: bool = False
    max_environment_steps: int = 200
    frame_stack: int = 3
    waypoint_bonus: float = 100.0
    heading_penalty: float = 25.0
    distance_bonus: float = 1.0
    distance_cutoff: float = 0.5
    use_background_traffic: bool = True
    terminated_at_infraction: bool = True
    seed: Optional[int] = None
    simulator: TorchDriveConfig = field(default_factory=TorchDriveConfig)
    render_mode: Optional[str] = "rgb_array"
    video_filename: Optional[str] = "rendered_video.mp4"
    video_res: Optional[int] = 1024
    video_fov: Optional[float] = 500.0
    device: Optional[str] = None
    # TPU-native: NPC behavioral model — "route" = deterministic IDM
    # route-follower; "policy" = recurrent GRU policy (npc/policy_net.py,
    # distilled from the route-follower by default; the local stand-in for
    # the reference's IAI DRIVE recurrent cloud model, gym_env.py:285-294).
    npc_mode: str = "route"
    # TPU-native: fresh reset states sampled per lockstep batch step for the
    # in-graph auto-reset (env/batched.py:_autoreset). 0 = one per env
    # (exact per-env streams); N = iid pool of N (same distribution, ~B/N x
    # cheaper; entries reused modulo N if >N envs finish simultaneously).
    reset_pool: int = 256


class BaselineAlgorithm(str, enum.Enum):
    """Reference: examples/common.py:10-14."""

    sac = "sac"
    ppo = "ppo"
    a2c = "a2c"
    td3 = "td3"


@dataclass
class RlCallbackConfig:
    """Reference: examples/common.py:16-21."""

    n_steps: int = 1000
    eval_n_episodes: int = 10
    deterministic: bool = True
    record: bool = True


@dataclass
class WandbCallbackConfig:
    """Reference: examples/common.py:23-27."""

    verbose: bool = True
    gradient_save_freq: int = 100
    model_save_freq: int = 100


@dataclass
class RlTrainingConfig:
    """Reference: examples/common.py:29-39, plus TPU-native scaling knobs."""

    algorithm: Optional[BaselineAlgorithm] = None
    parallel_env_num: int = 2
    project: str = "torchdriveenv_tpu"
    total_timesteps: float = 5e6
    record_training_examples: bool = True
    env: EnvConfig = field(default_factory=EnvConfig)
    eval_train_callback: RlCallbackConfig = field(default_factory=RlCallbackConfig)
    eval_val_callback: RlCallbackConfig = field(default_factory=RlCallbackConfig)
    wandb_callback: WandbCallbackConfig = field(default_factory=WandbCallbackConfig)
    # TPU-native additions (no reference analogue; SubprocVecEnv x N becomes
    # one vmapped batch, reference rl_training.py:159):
    checkpoint_dir: Optional[str] = None
    log_dir: str = "runs"
    # overrides for the algorithm config dataclass (PPOConfig/SACConfig/...),
    # e.g. {n_steps: 32, batch_size: 8192} to scale PPO to 1024+ envs
    algo_kwargs: Optional[dict] = None
    # off-policy (SAC/TD3) iteration shape: lockstep env steps then gradient
    # updates per jitted train step. The SB3 semantics (train_freq=1: one
    # update per env transition at 10 envs) correspond to steps=8/updates=8
    # at parallel_env_num=10; at 256+ envs raise updates_per_iter to keep a
    # useful update:data ratio.
    offpolicy_steps_per_iter: int = 8
    offpolicy_updates_per_iter: int = 8
    # off-policy demonstration warmup: for the first N env steps actions
    # come from the scripted demonstration driver (rl/demo.py) instead of
    # the policy, seeding the replay buffer with trajectories that reach
    # the 200-step horizon (gradient updates run as usual from
    # learning_starts). 0 (default) = off, matching SB3's random warmup.
    demo_warmup_steps: int = 0
    # persistent expert envs: keep the FIRST K envs scripted for the whole
    # run — a steady stream of horizon-reaching demonstration trajectories
    # in the replay buffer alongside the policy's own experience.
    demo_envs: int = 0
    # full-carry snapshot cadence (params+opt+replay buffer+env states) in
    # env steps. >0: periodic snapshots plus one at end of run; 0 (default):
    # end-of-run `full_latest` only — --resume_from always has something to
    # restore; <0: fully disabled (model-only saves still happen at
    # model_save_freq). A full SAC carry is GB-scale (replay frames) — over a
    # tunneled device transport periodic fetches can stall a run, hence the
    # end-of-run-only default.
    full_snapshot_every: int = 0


def _build_dataclass(cls, raw: Any):
    """Recursively build a dataclass from nested dicts (YAML output)."""
    if raw is None:
        return cls()
    if dataclasses.is_dataclass(raw):
        return raw
    if not isinstance(raw, dict):
        return raw
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        if key not in fields:
            raise TypeError(f"Unknown config field {key!r} for {cls.__name__}")
        ftype = fields[key].type
        target = _FIELD_TYPES.get((cls.__name__, key))
        if target is not None and isinstance(value, dict):
            kwargs[key] = _build_dataclass(target, value)
        elif target is not None and isinstance(target, type) and issubclass(target, enum.Enum) and value is not None:
            kwargs[key] = target(value)
        else:
            kwargs[key] = value
        del ftype
    return cls(**kwargs)


_FIELD_TYPES = {
    ("TorchDriveConfig", "renderer"): RendererConfig,
    ("TorchDriveConfig", "collision_metric"): CollisionMetric,
    ("EnvConfig", "simulator"): TorchDriveConfig,
    ("RlTrainingConfig", "env"): EnvConfig,
    ("RlTrainingConfig", "eval_train_callback"): RlCallbackConfig,
    ("RlTrainingConfig", "eval_val_callback"): RlCallbackConfig,
    ("RlTrainingConfig", "wandb_callback"): WandbCallbackConfig,
    ("RlTrainingConfig", "algorithm"): BaselineAlgorithm,
}


def construct_env_config(raw_config: Dict[str, Any]) -> EnvConfig:
    """Reference: env_utils.py:10-12."""
    return _build_dataclass(EnvConfig, raw_config)


def load_env_config(yaml_path: str) -> EnvConfig:
    """Reference: env_utils.py:15-17 (OmegaConf.load -> EnvConfig)."""
    with open(yaml_path) as f:
        return construct_env_config(yaml.safe_load(f))


def load_rl_training_config(yaml_path: str) -> RlTrainingConfig:
    """Reference: examples/common.py:41-47."""
    with open(yaml_path) as f:
        raw = yaml.safe_load(f)
    cfg = _build_dataclass(RlTrainingConfig, raw)
    if cfg.algorithm is not None and not isinstance(cfg.algorithm, BaselineAlgorithm):
        cfg.algorithm = BaselineAlgorithm(cfg.algorithm)
    cfg.total_timesteps = int(float(cfg.total_timesteps))
    return cfg


# ---------------------------------------------------------------------------
# Scenario data schemas (reference: gym_env.py:56-68)
# ---------------------------------------------------------------------------


@dataclass
class Scenario:
    """Per-case predefined agents (reference: gym_env.py:56-61)."""

    agent_states: Optional[List[List[float]]] = None       # [x, y, psi, speed]
    agent_attributes: Optional[List[List[float]]] = None   # [length, width, rear_axis_offset]
    recurrent_states: Optional[List[List[float]]] = None   # opaque NPC memory


@dataclass
class WaypointSuite:
    """The scenario suite (reference: gym_env.py:63-68)."""

    locations: Optional[List[str]] = None
    waypoint_suite: Optional[List[List[List[float]]]] = None
    car_sequence_suite: Optional[List[Optional[Dict[int, List[List[float]]]]]] = None
    scenarios: Optional[List[Optional[Scenario]]] = None
