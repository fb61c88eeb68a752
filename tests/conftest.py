"""Test harness: force an 8-virtual-device CPU mesh before JAX initializes.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use the
8 virtual devices.  Bench runs (bench.py) use the real TPU in a separate
process and are unaffected.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compile cache: repeated test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# XLA CPU's default conv/dot precision is reduced and varies with batch size;
# tests compare tiled vs untiled paths numerically, so pin full precision
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
