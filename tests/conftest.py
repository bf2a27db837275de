import os

# Tests run on a virtual 8-device CPU mesh so multi-device sharding is
# exercised without TPU hardware (replaces the reference's `mpiexec -n 8`).
# The axon site hook pins JAX_PLATFORMS before we get control, so the
# platform must be overridden via jax.config as well.
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
    return np.random.default_rng(0)
