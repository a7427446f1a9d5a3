"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices,
which exercises the same jit/shard_map/collective paths as a real TPU
slice (the reference had no distributed tests at all — SURVEY.md §4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU for the test suite regardless of the ambient platform (the
# dev box exports JAX_PLATFORMS=axon for the tunnelled TPU): tests need
# the 8-device virtual mesh, and TPU runs happen via bench.py / verify.
# The config update covers the case where a pytest plugin imported jax
# before this conftest ran (backends initialise lazily).
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
