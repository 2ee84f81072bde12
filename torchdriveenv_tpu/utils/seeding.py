"""Seeding helper (reference helpers.py:39-49).

JAX randomness is carried in explicit PRNG keys (host-count-invariant, see
DESIGN.md), so this only seeds the *host-side* RNGs used for data loading and
any numpy-based tooling, and returns the seed to derive the root jax key.
"""

from __future__ import annotations

import random
from typing import Optional

import numpy as np


def set_seeds(seed: Optional[int], logger=None) -> int:
    if seed is None:
        seed = int(np.random.randint(low=0, high=2**31 - 1))
    if logger is not None:
        logger.info(f"seed: {seed}")
    np.random.seed(seed)
    random.seed(seed)
    return seed
