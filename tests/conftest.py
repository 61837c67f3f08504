"""Test configuration.

Tests run on CPU with an emulated 8-device mesh so all sharding logic is
exercised without TPU hardware (SURVEY.md §4). These env vars must be set
before jax initializes its backends, hence the top-of-conftest placement.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# This box's TPU bootstrap (sitecustomize) calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter startup,
# which overrides the env var — force CPU again here, before any backend
# initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _fresh_registry():
    """Isolate the Register singleton between tests."""
    from rag_arc_tpu.framework.registry import Register

    Register().clear()
    yield
    Register().clear()
