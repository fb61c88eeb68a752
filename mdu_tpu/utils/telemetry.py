"""Perf telemetry: wall time + HBM high-water, and profiler traces.

TPU-native analogue of the reference's `perfcount` decorator
(ref scripts/tilevae.py:264-284: wall seconds + torch.cuda.max_memory print)
and the RAM/VRAM report in reset_and_gc (ref tilediffusion.py:598-608).
"""
from __future__ import annotations

import contextlib
import sys
import time
from typing import Optional

import jax


def device_memory_mb(device=None) -> Optional[float]:
    """Current bytes-in-use on the device, in MB (None if unsupported)."""
    try:
        dev = device or jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 2**20
    except Exception:
        pass
    return None


def device_peak_memory_mb(device=None) -> Optional[float]:
    try:
        dev = device or jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / 2**20
    except Exception:
        pass
    return None


@contextlib.contextmanager
def perfcount(label: str = "Tiled VAE", stream=None):
    """`with perfcount('Tiled VAE'):` — prints wall time + peak HBM."""
    stream = stream or sys.stderr
    t0 = time.time()
    yield
    dt = time.time() - t0
    peak = device_peak_memory_mb()
    if peak is not None:
        print(f"[{label}]: Done in {dt:.3f}s, peak HBM {peak:.1f} MB", file=stream)
    else:
        print(f"[{label}]: Done in {dt:.3f}s", file=stream)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mdu_tpu_trace"):
    """`with profile_trace():` — emits a jax.profiler trace for xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
