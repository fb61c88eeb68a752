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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
