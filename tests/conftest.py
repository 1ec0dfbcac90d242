"""Test harness config.

Runs every test on an 8-fake-device CPU backend so the real mesh/collective
code paths are exercised without TPU hardware (SURVEY §4: the rebuild must add
multi-device tests the reference never needed). Env vars MUST be set before
jax is imported anywhere.
"""

import os

# Force CPU even if the ambient environment selects a TPU platform.
# NOTE: the build machine's sitecustomize registers the axon TPU backend at
# interpreter start and prepends it to jax_platforms, so the env var alone
# is NOT enough — the config must be updated before first backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic-ish and fast on CPU in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
