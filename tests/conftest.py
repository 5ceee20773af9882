import os

# Tests run on a virtual 8-device CPU mesh: sharding/pjit paths compile and
# execute without TPU hardware; numerics are identical (pure integer ops).
# Force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. a TPU
# tunnel backend): unit tests are pure integer numerics, identical on
# every backend, and remote compiles would be pathologically slow.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone is not enough when a platform plugin (e.g. a TPU
# tunnel) force-registers itself at import; config.update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0DEC)
