"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (SURVEY.md §4).
The driver separately dry-runs the multi-chip path via __graft_entry__.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (TPU tunnel); the env var is
# overridden by the site customization, so force CPU through the config API.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite accumulates ~500 compiled CPU executables in one
    process; with jax 0.9.0's CPU backend that eventually segfaults
    inside backend_compile_and_load (observed twice at the same spot —
    the LAST module's compiles — while the same module passes standalone
    or earlier in the order).  Dropping the caches at module boundaries
    bounds the native arena instead.
    """
    yield
    jax.clear_caches()
