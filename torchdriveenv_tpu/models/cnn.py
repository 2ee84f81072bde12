"""NatureCNN image torso.

Same architecture as SB3's ``NatureCNN`` feature extractor used by every
baseline in the reference (``CnnPolicy``, reference examples/rl_training.py:
166-183): conv 32x8x8/4 - conv 64x4x4/2 - conv 64x3x3/1 - fc 512, ReLU
throughout, uint8 input scaled to [0, 1].

TPU notes: convs run in a configurable compute dtype (bfloat16 by default)
with fp32 params — XLA maps them onto the MXU; the uint8->float scale and
ReLUs fuse into the conv epilogues. Input layout is NCHW at the API boundary
(matching the env's channel-first obs) and transposed once to NHWC, the
layout XLA prefers on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NatureCNN(nn.Module):
    features: int = 512
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        """obs: (B, C, H, W) uint8 (C = 3 * frame_stack) -> (B, features) f32."""
        x = obs.astype(self.compute_dtype) / 255.0
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        # VALID padding matches SB3's NatureCNN exactly (needs >=36px input);
        # below that (small debug/test resolutions) fall back to SAME.
        pad = "VALID" if obs.shape[-1] >= 36 else "SAME"
        x = nn.Conv(32, (8, 8), strides=(4, 4), padding=pad,
                    dtype=self.compute_dtype, name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding=pad,
                    dtype=self.compute_dtype, name="conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(1, 1), padding=pad,
                    dtype=self.compute_dtype, name="conv3")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.features, dtype=self.compute_dtype, name="fc")(x)
        x = nn.relu(x)
        return x.astype(jnp.float32)
