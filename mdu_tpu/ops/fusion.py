"""Tile gather / scatter-accumulate fusion primitives.

TPU-native replacement for the reference's eager gather/scatter loops
(ref: tile_methods/multidiffusion.py:155-167 and
tile_methods/mixtureofdiffusers.py:104-126).  Tile geometry is static
Python, so gathers lower to `lax.slice` with constant bounds and scatters
to `x.at[...].add` with constant offsets — XLA fuses both; accumulation
order is the bbox order, making fusion bitwise deterministic.

Tiles are stacked on a leading tile axis `[T, B, C, th, tw]` so the UNet
sees one compiled shape regardless of grid size.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.bbox import BBox


def gather_tiles(x: jnp.ndarray, bboxes: Sequence[BBox]) -> jnp.ndarray:
    """Gather same-size tiles from an NCHW canvas -> [T, B, C, th, tw]."""
    tiles = [
        jax.lax.slice(x, (0, 0, b.y, b.x), (x.shape[0], x.shape[1], b.y + b.h, b.x + b.w))
        for b in bboxes
    ]
    return jnp.stack(tiles, axis=0)


def scatter_add_tiles(
    canvas: jnp.ndarray,
    tiles: jnp.ndarray,
    bboxes: Sequence[BBox],
    tile_weights: Optional[jnp.ndarray] = None,
    per_tile_weights: Optional[Sequence[Optional[jnp.ndarray]]] = None,
) -> jnp.ndarray:
    """Scatter-add stacked tiles `[T, B, C, th, tw]` into an NCHW canvas.

    ``tile_weights``      — one [th, tw] (or broadcastable) map applied to every
                            tile (Mixture-of-Diffusers gaussian weights).
    ``per_tile_weights``  — optional per-tile maps (MoD's
                            ``tile_weights * rescale_factor[bbox]``,
                            ref mixtureofdiffusers.py:125-126).
    """
    for i, b in enumerate(bboxes):
        t = tiles[i]
        if tile_weights is not None:
            t = t * tile_weights
        if per_tile_weights is not None and per_tile_weights[i] is not None:
            t = t * per_tile_weights[i]
        canvas = canvas.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(t)
    return canvas


def weighted_average(canvas: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """MultiDiffusion fusion normalize: ``where(w > 1, buf / w, buf)``
    (ref multidiffusion.py:208)."""
    return jnp.where(weights > 1, canvas / weights, canvas)


def feather_blend(
    x_out: jnp.ndarray,
    feather_buffer: jnp.ndarray,
    feather_mask: jnp.ndarray,
    feather_count: jnp.ndarray,
) -> jnp.ndarray:
    """FOREGROUND region feather blending (ref multidiffusion.py:211-216).

    Overlapping feathered regions are averaged, then alpha-blended over the
    background result by the accumulated feather mask.
    """
    buf = jnp.where(feather_count > 1, feather_buffer / feather_count, feather_buffer)
    msk = jnp.where(feather_count > 1, feather_mask / feather_count, feather_mask)
    return jnp.where(feather_count > 0, x_out * (1 - msk) + buf * msk, x_out)


def repeat_to_batch(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Repeat on the leading dim (ref `repeat_tensor`, multidiffusion.py:100-110).

    Under XLA, broadcast vs tile is the compiler's call; semantics only.
    """
    if n == 1:
        return x
    return jnp.concatenate([x] * n, axis=0)
