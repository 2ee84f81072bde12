"""RL training stack: on-device replay, SAC/PPO/A2C/TD3 learners, eval.

The reference trains SB3 baselines over OS-process vectorized envs
(examples/rl_training.py). Here rollout and learning are fused into jitted
device programs: envs are a batch axis, the replay buffer lives in HBM, and
the learner shares the step's XLA program when run Anakin-style.
"""
