"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding logic is testable without a TPU pod (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:  # tools/ imports (tests/test_map_fidelity.py)
    sys.path.insert(0, _REPO_ROOT)

import jax  # noqa: E402

# belt and braces: a pytest plugin may have imported jax before this conftest,
# in which case the env vars above are too late — force via the config API
# (works as long as no backend is initialized yet).
jax.config.update("jax_platforms", "cpu")
import pytest  # noqa: E402

from torchdriveenv_tpu.maps.arrays import load_assets  # noqa: E402


@pytest.fixture(scope="session")
def assets_train():
    return load_assets("train")


@pytest.fixture(scope="session")
def assets_val():
    return load_assets("val")


@pytest.fixture(scope="session")
def key():
    return jax.random.PRNGKey(0)
