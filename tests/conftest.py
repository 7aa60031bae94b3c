"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize pre-imports jax and registers the 'axon'
TPU backend, so env vars alone are too late; ``jax.config.update`` before
the first backend query reliably selects CPU. Multi-chip sharding tests
run against jax.sharding.Mesh over these 8 virtual devices, matching how
the driver dry-runs the multichip path.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
