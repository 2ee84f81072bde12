"""Policy/value networks (Flax).

The reference trains Stable-Baselines3 ``CnnPolicy`` models (NatureCNN torso,
reference examples/rl_training.py:166-183). These are the TPU-native
equivalents: same architecture family, bfloat16-friendly, built to run with
batch dims large enough to keep the MXU busy.
"""

from torchdriveenv_tpu.models.cnn import NatureCNN
from torchdriveenv_tpu.models.policies import (
    DeterministicActor,
    DoubleQCritic,
    GaussianActorCritic,
    SquashedGaussianActor,
)

__all__ = [
    "NatureCNN",
    "SquashedGaussianActor",
    "DeterministicActor",
    "DoubleQCritic",
    "GaussianActorCritic",
]
