"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Multi-chip hardware is not available in CI; sharding correctness is tested
on 8 virtual CPU devices (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).  Environment must be
set before jax initializes its backends, hence module-level.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: op dispatch/compile is expensive in this
# environment; caching across pytest runs keeps the suite fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
