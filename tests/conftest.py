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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables at module boundaries.

    jaxlib 0.9.0's XLA:CPU backend segfaults inside
    `backend_compile_and_load` once a single process has accumulated enough
    live compiled programs (deterministic: the full suite in one process
    dies at ~test 98 in whichever big compile runs there, while the same
    module passes alone — reproduced with MALLOC_CHECK_/PYTHONMALLOC debug
    showing no earlier heap corruption, and 500 small fresh compiles do NOT
    trigger it). Dropping executables between modules keeps the in-process
    JIT footprint bounded so `python -m pytest tests/ -q` survives in one
    invocation; within a module, tests still share their compile cache.
    """
    yield
    import jax

    jax.clear_caches()
