"""Test harness: force an 8-virtual-device CPU mesh.

The container's sitecustomize imports jax and registers the tunneled TPU
(axon) backend in every process, so env vars alone are not enough — the
platform must be overridden via jax.config before first backend use.

All tests run on CPU (fast, deterministic); multi-chip sharding tests use
the 8 virtual devices.  bench.py uses the real TPU in a separate process.
"""
import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compile cache: repeated test runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# pin full precision: tests compare tiled vs untiled paths numerically, and
# default matmul/conv precision is reduced (bf16) on TPU-default configs
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
