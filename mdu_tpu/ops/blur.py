"""Gaussian blur for DemoFusion's global-view input smoothing.

(ref: tile_methods/demofusion.py:164-178 — depthwise conv2d with a
normalized gaussian kernel, zero padding, kernel size 2*scale-1.)

Sigma is a *traced* value (it follows a per-step cosine schedule,
demofusion.py:270-272), so the kernel is built with jnp inside jit; the
kernel size stays static.  Implemented as two separable 1-D depthwise
convolutions — O(k) instead of O(k²) work per pixel, and XLA maps small
depthwise convs onto the VPU efficiently.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_kernel_1d(kernel_size: int, sigma: jnp.ndarray) -> jnp.ndarray:
    """Normalized 1-D gaussian taps [kernel_size] (ref demofusion.py:164-171)."""
    x = jnp.arange(kernel_size, dtype=jnp.float32)
    g = jnp.exp(-((x - (kernel_size - 1) / 2.0) ** 2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def gaussian_blur_nchw(x: jnp.ndarray, kernel_size: int, sigma) -> jnp.ndarray:
    """Separable depthwise gaussian blur with zero ('same') padding.

    Matches the reference's single 2-D conv (an outer product of the 1-D
    taps) because the gaussian is separable and padding is zero-fill.
    """
    C = x.shape[1]
    sigma = jnp.asarray(sigma, dtype=jnp.float32)
    k1 = gaussian_kernel_1d(kernel_size, sigma)
    pad = kernel_size // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, kernel_size, 1), ("NCHW", "OIHW", "NCHW"))
    dt = x.dtype
    xf = x.astype(jnp.float32)
    kh = jnp.tile(k1.reshape(1, 1, kernel_size, 1), (C, 1, 1, 1))
    kw = jnp.tile(k1.reshape(1, 1, 1, kernel_size), (C, 1, 1, 1))
    out = jax.lax.conv_general_dilated(
        xf, kh, window_strides=(1, 1), padding=((pad, pad), (0, 0)),
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, kw, window_strides=(1, 1), padding=((0, 0), (pad, pad)),
        dimension_numbers=dn, feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    return out.astype(dt)
