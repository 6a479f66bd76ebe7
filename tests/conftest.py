"""Test configuration: force an 8-device virtual CPU platform.

The environment's sitecustomize imports jax at interpreter start (registering
the TPU plugin and latching JAX_PLATFORMS), so an os.environ override here is
too late — the platform must be forced through jax.config instead. XLA_FLAGS
is still read lazily at first backend init, so setting it here works. The
multi-chip sharding tests use the 8 virtual CPU devices
(`jax.sharding.Mesh` over CPU) exactly as the driver's dryrun does.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
