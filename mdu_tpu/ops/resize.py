"""Separable resize as two matmuls — torch-parity semantics, MXU-friendly.

The reference leans on ``F.interpolate`` in four places: nearest-exact for
VAE fast-mode stats (tilevae.py:547) and the cheap-approx preview
(tilevae.py:572), bilinear for the renoise mask (abstractdiffusion.py:619),
and bicubic for DemoFusion's progressive latent upscale (tileglobal.py:316).

On TPU a resize is best expressed as ``out = W_h @ x @ W_wᵀ`` with
precomputed (host-side, static) interpolation weight matrices: XLA maps the
two contractions straight onto the MXU and fuses the surrounding elementwise
work.  Weight construction follows torch's half-pixel conventions:
  * nearest-exact: src = floor((i + 0.5) / scale)
  * bilinear     : half-pixel centers, align_corners=False
  * bicubic      : Keys kernel with a = -0.75 (torch's choice; jax.image uses
                   a = -0.5, hence the custom implementation)
"""
from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2.0, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


@lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int, method: str) -> np.ndarray:
    """[n_out, n_in] row-stochastic interpolation matrix."""
    W = np.zeros((n_out, n_in), dtype=np.float64)
    if n_in == n_out:
        np.fill_diagonal(W, 1.0)
        return W.astype(np.float32)
    scale = n_in / n_out
    if method == "nearest":  # torch 'nearest-exact'
        src = np.floor((np.arange(n_out) + 0.5) * scale).astype(np.int64)
        src = np.clip(src, 0, n_in - 1)
        W[np.arange(n_out), src] = 1.0
    elif method == "linear":
        src = (np.arange(n_out) + 0.5) * scale - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for i in range(n_out):
            l = min(max(lo[i], 0), n_in - 1)
            r = min(max(lo[i] + 1, 0), n_in - 1)
            W[i, l] += 1 - frac[i]
            W[i, r] += frac[i]
    elif method == "cubic":
        src = (np.arange(n_out) + 0.5) * scale - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for i in range(n_out):
            taps = _cubic_kernel(np.array([1 + frac[i], frac[i], 1 - frac[i], 2 - frac[i]]))
            taps = taps / taps.sum()
            for k in range(4):
                idx = min(max(lo[i] - 1 + k, 0), n_in - 1)  # border replicate
                W[i, idx] += taps[k]
    elif method == "lanczos":
        a = 3
        src = (np.arange(n_out) + 0.5) * scale - 0.5
        lo = np.floor(src).astype(np.int64)
        frac = src - lo
        for i in range(n_out):
            offs = np.arange(-a + 1, a + 1)
            t = offs - frac[i]
            taps = np.sinc(t) * np.sinc(t / a)
            taps = taps / taps.sum()
            for k, o in enumerate(offs):
                idx = min(max(lo[i] + o, 0), n_in - 1)
                W[i, idx] += taps[k]
    else:
        raise ValueError(f"unknown resize method: {method}")
    return W.astype(np.float32)


def resize_nchw(x: jnp.ndarray, size: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize the trailing (H, W) of an NCHW array. method: nearest|linear|cubic."""
    H_out, W_out = size
    H_in, W_in = x.shape[-2], x.shape[-1]
    if (H_in, W_in) == (H_out, W_out):
        return x
    wh = jnp.asarray(_resize_matrix(H_in, H_out, method))
    ww = jnp.asarray(_resize_matrix(W_in, W_out, method))
    dt = x.dtype
    xf = x.astype(jnp.float32)
    out = jnp.einsum("Hh,...hw,Ww->...HW", wh, xf, ww, precision="highest")
    return out.astype(dt)


def scale_size(h: int, w: int, scale: float) -> Tuple[int, int]:
    """torch scale_factor semantics: floor(size * scale)."""
    return int(h * scale), int(w * scale)
