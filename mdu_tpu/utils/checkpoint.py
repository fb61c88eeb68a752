"""Param checkpoint save/restore (orbax) + NaN sentinels.

SURVEY.md §5: the reference has no model checkpointing (models owned by
A1111); its resume artifacts are the noise-inversion cache and region-config
JSONs (both implemented elsewhere).  This module adds what a standalone
framework needs: orbax save/restore for param trees and the NaN guards the
reference scatters through tilevae (tilevae.py:500-503, 625).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def save_params(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_params(path: str, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)


def check_finite(x: jnp.ndarray, label: str = "tensor") -> jnp.ndarray:
    """Host-side NaN/Inf abort (ref devices.test_for_nans, tilevae.py:625).

    Call on results after jit boundaries — raises with a clear message
    instead of silently emitting black images.
    """
    import numpy as np

    arr = np.asarray(x)
    if not np.isfinite(arr).all():
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        raise FloatingPointError(
            f"NaN/Inf detected in {label}: {n_nan} NaNs, {n_inf} Infs "
            f"(shape {arr.shape}) — for fp16-style overflows use bf16 weights "
            "or fp32 GroupNorm stats (enabled by default)")
    return x
