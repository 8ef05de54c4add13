"""Test harness: force an 8-virtual-device CPU platform BEFORE jax imports so
every test can exercise the multi-chip sharding paths without TPU hardware."""

import os
import sys

# The image pins JAX_PLATFORMS=axon (remote TPU) and its sitecustomize
# register() re-sets the jax_platforms CONFIG at interpreter start, so an env
# override alone is not enough — force the config back to cpu before any
# backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
