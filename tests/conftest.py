"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated here without TPU hardware
(xla_force_host_platform_device_count=8); numerical parity tests need x64.
Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite compiles hundreds of distinct
# XLA programs on a single core (5-30 s each); re-runs hit the disk cache
# instead. Cold runs are unaffected.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
