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

# ---- test tiers -----------------------------------------------------------
# The full suite is ~1100 tests / ~90 min on this single-core box. The fast
# tier (`pytest -m "not slow"`) is the guardrail target: < 10 min. Modules in
# these categories are auto-marked `slow` at collection (reference-live
# execution parity, end-to-end pipelines, multi-minute drivers); individual
# tests can also opt in with @pytest.mark.slow.
_SLOW_MODULE_PATTERNS = (
    "test_reference_live",       # 56 live-execution parity waves (torch+ref)
    "test_reference_recipes",    # full CLI recipe replays
    "test_reference_parity",     # oracle batteries
    "test_flagship",             # multi-minute e2e AutoTS / aldol
    "test_othermethod_molecular",  # ADDF/2PSHS/GNT/dimer on HCN<->HNC
    "test_mapper_reactive",      # reactive network exploration
    "test_h3_reaction",
    "test_host_bridge_live",     # subprocess torch-SQM2 bridge
    "test_symmetry_breadth",     # 10-fixture live parity battery
    "test_nro_host",
    "test_autots",               # AutoTS pipelines (v1/v2/topn/config)
    "test_sqm2_battery",
)


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "")
        if any(p in name for p in _SLOW_MODULE_PATTERNS):
            item.add_marker(slow)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)
