"""Gymnasium single-agent adapter over the batched TPU engine.

Drop-in parity with the reference's registered env: the reference wraps
``WaypointSuiteEnv`` in ``SingleAgentWrapper`` which strips the batch and
agent singleton dims both ways (reference torchdriveenv/__init__.py:10,
gym_env.py:440-487). Here the underlying engine is natively batched, so the
adapter simply runs it with B=1 and converts at the host boundary:

  action  np.float32 (2,)        -> device (1, 2)
  obs     device (1, 3, res,res) -> np.uint8 (3, res, res)
  reward/terminated/truncated/info -> python scalars / np arrays

Auto-reset is handled by the adapter (Gymnasium contract: the caller calls
``reset()`` after an episode ends), so the engine's in-graph auto-reset is
disabled on this path: we keep the pre-reset terminal observation, matching
the reference's step semantics exactly.

Also provides ``metadata`` (render_modes ["video", "rgb_array"], fps 10 —
reference gym_env.py:73-76), ``render()`` returning an HWC uint8 frame
(reference gym_env.py:152-157) and close-time video save when
``render_mode == "video"`` (reference gym_env.py:172-176).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from torchdriveenv_tpu.config import EnvConfig
from torchdriveenv_tpu.env import core
from torchdriveenv_tpu.maps.arrays import Assets, load_assets
from torchdriveenv_tpu.ops.rasterizer import render_egocentric
from torchdriveenv_tpu.utils.seeding import set_seeds


class TpuGymEnv(gym.Env):
    """Single-agent Gymnasium view of the batched engine (B = 1).

    Reference counterparts: ``GymEnv``/``WaypointSuiteEnv`` +
    ``SingleAgentWrapper`` (gym_env.py:71-176,303-487).
    """

    metadata = {"render_modes": ["video", "rgb_array"], "render_fps": 10}

    def __init__(self, cfg: EnvConfig, data: Any = None,
                 assets: Optional[Assets] = None):
        self.cfg = cfg
        if assets is None:
            if isinstance(data, Assets):
                assets = data
            else:
                assets = load_assets("train" if data is None else data)
        self.assets = assets
        # action space: accel in [-1,1], steering in [-0.3,0.3]
        # (reference gym_env.py:83-94)
        self.action_space = gym.spaces.Box(
            low=np.array([-1.0, -0.3], np.float32),
            high=np.array([1.0, 0.3], np.float32), shape=(2,), dtype=np.float32)
        res = cfg.simulator.renderer.obs_res
        # obs space: uint8 channel-first birdview (reference gym_env.py:95)
        self.observation_space = gym.spaces.Box(
            low=0, high=255, shape=(3, res, res), dtype=np.uint8)

        seed = set_seeds(cfg.seed)
        self._key = jax.random.PRNGKey(seed)
        self._state: Optional[core.EnvState] = None
        self._frames = []  # video-mode frame buffer

        npc_params = None
        if cfg.npc_mode == "policy":
            from torchdriveenv_tpu.npc.policy_net import default_params
            npc_params = default_params()
        self._reset1 = jax.jit(functools.partial(core.reset, cfg, assets))
        self._step1 = jax.jit(functools.partial(core.step, cfg, assets,
                                                npc_params=npc_params))
        self._obs1 = jax.jit(functools.partial(self._render_obs, cfg, assets))
        if cfg.render_mode == "video":
            self._video1 = jax.jit(functools.partial(
                self._render_obs, cfg, assets,
                res=int(cfg.video_res or 1024), fov=float(cfg.video_fov or 500.0)))

    @staticmethod
    def _render_obs(cfg: EnvConfig, assets: Assets, state: core.EnvState,
                    res: Optional[int] = None, fov: Optional[float] = None):
        rcfg = cfg.simulator.renderer
        t = state.time0 + state.step_idx.astype(jnp.float32) * cfg.simulator.dt
        return render_egocentric(
            assets.maps, state.town, t,
            state.agent_states, state.agent_attrs, state.present,
            assets.suite.waypoints[state.case], state.target_idx,
            assets.suite.n_waypoints[state.case],
            res=res or rcfg.obs_res, fov=fov or rcfg.obs_fov,
            left_handed=rcfg.left_handed_coordinates,
            highlight_ego=rcfg.highlight_ego_vehicle,
        )

    # -- gym API ------------------------------------------------------------

    def _get_obs(self) -> np.ndarray:
        obs = np.asarray(self._obs1(self._state))
        if self.cfg.render_mode == "video":
            self._frames.append(np.asarray(self._video1(self._state)))
        return obs

    def reset(self, *, seed: Optional[int] = None, options=None
              ) -> Tuple[np.ndarray, Dict]:
        super().reset(seed=seed)
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        self._key, k = jax.random.split(self._key)
        self._state = self._reset1(k)
        return self._get_obs(), {}

    def step(self, action) -> Tuple[np.ndarray, float, bool, bool, Dict]:
        action = jnp.asarray(np.asarray(action, np.float32))
        self._state, reward, term, trunc, info = self._step1(self._state, action)
        obs = self._get_obs()
        info = {k: np.asarray(v) for k, v in info.items()}
        # reference exposes per-term reward breakdown in info
        # (gym_env.py:419-437); engine already includes psi/dist rewards
        return obs, float(reward), bool(term), bool(trunc), info

    def mock_step(self, action=None
                  ) -> Tuple[np.ndarray, float, bool, bool, Dict]:
        """Canned transition without advancing the simulator — the built-in
        fake the reference keeps for simulator/API failures
        (reference gym_env.py:159-170)."""
        obs = np.asarray(self._obs1(self._state)) if self._state is not None \
            else np.zeros(self.observation_space.shape, np.uint8)
        info = {"offroad": np.zeros(()), "collision": np.zeros(()),
                "traffic_light_violation": np.zeros(()),
                "is_success": np.asarray(False)}
        return obs, 0.0, False, True, info

    def render(self) -> Optional[np.ndarray]:
        # rgb_array mode returns an HWC uint8 frame (reference gym_env.py:152-157)
        obs = np.asarray(self._obs1(self._state))
        return obs.transpose(1, 2, 0)

    def close(self):
        if self.cfg.render_mode == "video" and self._frames:
            from torchdriveenv_tpu.utils.video import save_video
            save_video([f.transpose(1, 2, 0) for f in self._frames],
                       self.cfg.video_filename or "rendered_video.mp4",
                       fps=self.metadata["render_fps"])
            self._frames = []


def make_gym_env(cfg: Optional[EnvConfig] = None, data: Any = None,
                 **kwargs) -> gym.Env:
    """Entry point for ``gym.make('torchdriveenv-v0', args={...})``.

    Mirrors the reference entry lambda
    (torchdriveenv/__init__.py:10: ``SingleAgentWrapper(WaypointSuiteEnv(
    args['cfg'], args['data']))``); `data` may be "train"/"val", a path to a
    compiled suite, or pre-loaded ``Assets``.
    """
    return TpuGymEnv(cfg or EnvConfig(), data=data, **kwargs)
