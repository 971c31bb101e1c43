"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; all sharding paths are
exercised on a virtual CPU mesh (the XLA host platform with 8 devices).
This must run before jax initializes its backends, hence the env vars are
set at conftest import time.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU backend: the environment exports JAX_PLATFORMS=axon (a
# remote-TPU tunnel) which must not be used for unit tests. jax may already
# be imported by sitecustomize, so use config.update (effective until the
# first backend initialization) rather than env vars.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
assert jax.local_device_count() == 8, jax.local_devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(3)
