"""End-to-end tests of the user-facing surfaces (VERDICT.md weak #1):
the registered Gym env, the training CLI (train -> checkpoint -> resume),
and the evaluation example — the paths a reference user actually touches.

Reference counterparts: gym.make('torchdriveenv-v0') via __init__.py:10;
examples/rl_training.py end-to-end; waypoint_suite_evaluation.ipynb.
"""

import os

import gymnasium as gym
import numpy as np
import pytest

from torchdriveenv_tpu.config import (
    EnvConfig,
    RendererConfig,
    RlCallbackConfig,
    RlTrainingConfig,
    TorchDriveConfig,
    BaselineAlgorithm,
)

INFO_KEYS = {"offroad", "collision", "traffic_light_violation", "is_success",
             "reached_waypoint_num", "psi_smoothness", "speed_smoothness"}


def _small_env_cfg(**kw):
    """Short episodes so jitted 200-step scans aren't compiled in tests."""
    return EnvConfig(
        max_environment_steps=16, seed=11, reset_pool=0,
        simulator=TorchDriveConfig(renderer=RendererConfig(obs_res=64)),
        **kw)


class TestGymAdapter:
    def test_gym_make_full_episode(self, assets_val):
        env = gym.make("torchdriveenv-v0",
                       args={"cfg": _small_env_cfg(), "data": assets_val})
        obs, info = env.reset(seed=5)
        assert obs.shape == (3, 64, 64) and obs.dtype == np.uint8
        assert env.action_space.shape == (2,)
        total_r, steps = 0.0, 0
        done = False
        while not done:
            obs, r, term, trunc, info = env.step(
                np.array([0.5, 0.0], np.float32))
            total_r += r
            steps += 1
            done = term or trunc
            assert steps <= 16
        assert INFO_KEYS <= set(info.keys())
        assert obs.shape == (3, 64, 64)
        frame = env.render()
        assert frame.shape == (64, 64, 3)
        # mock_step: canned transition without advancing the sim
        # (reference gym_env.py:159-170)
        mobs, mr, mterm, mtrunc, minfo = env.unwrapped.mock_step()
        assert mobs.shape == (3, 64, 64) and mr == 0.0 and mtrunc
        env.close()

    def test_gym_video_close_path(self, assets_val, tmp_path):
        path = str(tmp_path / "episode.avi")
        cfg = _small_env_cfg(render_mode="video", video_filename=path,
                             video_res=128, video_fov=100.0, ego_only=True)
        env = gym.make("torchdriveenv-v0",
                       args={"cfg": cfg, "data": assets_val})
        env.reset(seed=1)
        for _ in range(3):
            env.step(np.array([0.5, 0.0], np.float32))
        env.close()
        assert os.path.exists(path) and os.path.getsize(path) > 1000

    def test_gym_reset_seeding_deterministic(self, assets_val):
        def first_obs(seed):
            env = gym.make("torchdriveenv-v0",
                           args={"cfg": _small_env_cfg(), "data": assets_val})
            obs, _ = env.reset(seed=seed)
            env.close()
            return obs

        a, b = first_obs(9), first_obs(9)
        np.testing.assert_array_equal(a, b)


@pytest.fixture(scope="module")
def tiny_train_cfg(tmp_path_factory):
    d = tmp_path_factory.mktemp("train")
    cb = RlCallbackConfig(n_steps=64, eval_n_episodes=2, record=False)
    return RlTrainingConfig(
        algorithm=BaselineAlgorithm.sac,
        parallel_env_num=2,
        total_timesteps=64,
        env=_small_env_cfg(ego_only=True),
        eval_train_callback=cb, eval_val_callback=cb,
        checkpoint_dir=str(d / "ckpt"), log_dir=str(d / "runs"))


@pytest.mark.slow
class TestTrainCli:
    def test_train_eval_checkpoint_resume(self, tiny_train_cfg):
        from torchdriveenv_tpu.rl.train import train

        cfg = tiny_train_cfg
        carry = train(cfg)
        assert int(np.asarray(carry.env_steps)) >= 64
        # JSONL learning log with train/ and eval/ records
        logs = [f for f in os.listdir(cfg.log_dir) if f.endswith(".jsonl")]
        assert logs
        text = open(os.path.join(cfg.log_dir, logs[0])).read()
        assert '"eval/success_percentage"' in text
        assert '"eval_train/' in text
        # model-only + full-carry checkpoints exist
        names = os.listdir(cfg.checkpoint_dir)
        assert "full_latest" in names
        assert any(n.startswith("model_") for n in names)

        # resume from the full checkpoint and keep training
        cfg.total_timesteps = 128
        carry2 = train(cfg, resume_from=os.path.join(cfg.checkpoint_dir,
                                                     "full_latest"))
        assert int(np.asarray(carry2.env_steps)) >= 128

    def test_evaluate_policy_example(self, tiny_train_cfg):
        """examples/evaluate_policy.py roundtrip on the smoke checkpoint
        (reference waypoint_suite_evaluation.ipynb path)."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "examples"))
        from evaluate_policy import evaluate

        model = sorted(n for n in os.listdir(tiny_train_cfg.checkpoint_dir)
                       if n.startswith("model_"))[-1]
        metrics = evaluate(
            os.path.join(tiny_train_cfg.checkpoint_dir, model),
            algorithm="sac", episodes=2, suite="val",
            env_cfg=tiny_train_cfg.env)
        base = {
            "mean_episode_reward", "mean_episode_length", "offroad_rate",
            "collision_rate", "traffic_light_violation_rate",
            "success_percentage", "reached_waypoint_num", "psi_smoothness",
            "speed_smoothness"}
        # suite="val" pins episodes to the 5 named cases and adds per-case
        # success/reached breakdowns (reference README.md:15-27 granularity)
        per_case = {f"{k}_case_{i}" for k in ("success", "reached")
                    for i in range(5)}
        assert set(metrics) == base | per_case
        assert 0 < metrics["mean_episode_length"] <= 16
