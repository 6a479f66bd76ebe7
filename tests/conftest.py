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
# Persistent compilation cache: the suite is compile-bound on a 1-CPU box
# (~14 min cold); cached re-runs skip XLA compiles entirely, keeping the
# iteration loop fast. Keys are HLO content hashes — safe across edits.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
