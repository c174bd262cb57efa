"""Test harness: force the CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (must run before jax import)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the environment's sitecustomize force-registers the TPU plugin and
# overrides jax_platforms; pin tests to the virtual-device CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
