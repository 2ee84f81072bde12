"""torchdriveenv_tpu — a TPU-native driving-RL environment framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``inverted-ai/torchdriveenv`` (waypoint-following driving benchmark with NPC
traffic, kinematic bicycle dynamics, collision/offroad/traffic-light
infractions and rasterized birdview observations).

The reference registers a Gymnasium env ``torchdriveenv-v0``
(reference: torchdriveenv/__init__.py:10); we register the same id backed by
the batched TPU engine, plus the native batched API.
"""

__version__ = "0.1.0"

import os

# Paths where bundled compiled assets and scenario data live
# (reference analogue: torchdriveenv/__init__.py:1-8 `_data_path`).
_pkg_dir = os.path.dirname(os.path.realpath(__file__))
_data_path = [os.path.join(_pkg_dir, "assets")]


def _register_gym():
    """Register `torchdriveenv-v0` if gymnasium is importable.

    Matches the entry-point semantics of the reference
    (torchdriveenv/__init__.py:10): the registered env is a single-agent
    Gymnasium adapter over the batched engine.
    """
    try:
        import gymnasium as gym
    except Exception:  # pragma: no cover - gym always present in CI image
        return
    def _entry(args=None):
        from torchdriveenv_tpu.env.gym_adapter import make_gym_env

        return make_gym_env(**(args or {}))

    try:
        gym.register(id="torchdriveenv-v0", entry_point=_entry)
    except gym.error.Error:
        # already registered (double import)
        pass


_register_gym()
