"""Test configuration: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere, so this sits at the very top of
conftest. Multi-chip sharding tests use the 8 virtual devices
(`jax.sharding.Mesh` over CPU) exactly as the driver's dryrun does.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
