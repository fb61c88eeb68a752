"""Init-image pre-upscalers for img2img tiled upscaling.

The reference delegates to A1111's GAN upscaler registry
(ref scripts/tilediffusion.py:281-304); this framework ships the built-in
resamplers and a registry hook so model-based upscalers (ESRGAN-style) can
be plugged in as jittable callables.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from .ops.resize import resize_nchw

# upscaler: (image [B,3,H,W] in [-1,1], scale: float) -> [B,3,H*s,W*s]
Upscaler = Callable[[jnp.ndarray, float], jnp.ndarray]

_REGISTRY: Dict[str, Upscaler] = {}


def register_upscaler(name: str, fn: Upscaler) -> None:
    _REGISTRY[name] = fn


def get_upscaler(name: str) -> Upscaler:
    if name not in _REGISTRY:
        raise KeyError(f"unknown upscaler '{name}'; available: {list(_REGISTRY)}")
    return _REGISTRY[name]


def list_upscalers():
    return list(_REGISTRY)


def _resize_upscaler(method: str) -> Upscaler:
    def fn(x: jnp.ndarray, scale: float) -> jnp.ndarray:
        H, W = x.shape[-2], x.shape[-1]
        return resize_nchw(x, (int(H * scale), int(W * scale)), method)
    return fn


register_upscaler("None", lambda x, s: x)
register_upscaler("Nearest", _resize_upscaler("nearest"))
register_upscaler("Bilinear", _resize_upscaler("linear"))
register_upscaler("Bicubic", _resize_upscaler("cubic"))
register_upscaler("Lanczos", _resize_upscaler("lanczos"))
