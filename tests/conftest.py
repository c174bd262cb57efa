"""Test harness: force the CPU backend with 8 virtual devices so sharding
logic is exercised without TPU hardware (must run before jax import)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# no persistent compile cache in tests: XLA:CPU executable serialization
# can CHECK-abort (SIGABRT) on some programs; see openpano_tpu/__init__
os.environ["OPENPANO_NO_COMPILE_CACHE"] = "1"
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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    The XLA:CPU backend segfaults (or SIGABRTs serializing an
    executable) once a single process has accumulated the whole suite's
    compilations — observed repeatedly around the 115th test (r4), always
    inside backend_compile_and_load, with kernel soft-lockups from
    memory-reclaim stalls alongside.  Bounding the live executable set to
    one module's worth keeps the compiler healthy at the cost of a few
    cross-module recompiles."""
    yield
    jax.clear_caches()
