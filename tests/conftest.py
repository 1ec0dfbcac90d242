"""Test harness config.

Runs every test on an 8-fake-device CPU backend so the real mesh/collective
code paths are exercised without TPU hardware (SURVEY §4: the rebuild must add
multi-device tests the reference never needed). Env vars MUST be set before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep matmuls deterministic-ish and fast on CPU in tests.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
