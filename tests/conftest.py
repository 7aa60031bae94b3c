"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding tests run against jax.sharding.Mesh over these virtual
devices; the driver separately dry-runs the multichip path the same way.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
