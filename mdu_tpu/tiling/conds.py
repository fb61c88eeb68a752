"""Conditioning pytrees and per-tile cond slicing.

The reference threads A1111's CondDict through tile batching with manual
tcond/icond/vcond accessors (ref abstractdiffusion.py:119-168,
multidiffusion.py:112-129).  Here conditioning is one explicit pytree and
slicing is generic over its leaves:

  cond = {
    'crossattn': [B, L, D]        text embeddings
    'concat':    [B, C, h, w]     image conditioning (inpaint/img2img mask,
                 or [B, C, 1, 1]  txt2img dummy; edit-model ip2p image latent)
    'vector':    [B, D]           SDXL pooled+size vector (optional)
    'adm':       [B, D]           unclip CLIP image embedding (optional;
                                  ref 'c_adm', abstractdiffusion.py:133-141)
    'control':   [[B, C, H, W]]   ControlNet hints, pixel space (optional)
  }

Rules per leaf when building a tile batch of K tiles (tile-major):
  * spatial == latent canvas  -> slice the tile bbox   (icond, ref :121-122)
  * spatial == pixel canvas   -> slice bbox * 8        (hints, ref :501)
  * otherwise                 -> repeat K times        (tcond/vcond, ref :117-128)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.bbox import BBox

Cond = Dict[str, Any]
LATENT_TO_PIXEL = 8


def quantize_control_hints(cond: Optional[Cond],
                           min_pixels: Optional[int] = None) -> Optional[Cond]:
    """Store large ControlNet hint canvases as uint8 in HBM.

    The reference optionally stages per-tile hint tensors on CPU to relieve
    VRAM (ref abstractdiffusion.py:504-505).  The TPU-native answer keeps the
    canvas resident but quantized: hints originate as uint8 images, so a
    uint8 canvas is lossless at 1/4 the f32 footprint (an 8192^2 hint drops
    0.75 GB -> 0.19 GB), slices stay pure device ops inside jit, and the
    per-tile dequantize (x/255) fuses into the ControlNet cond-embedding
    conv.  No host round-trips per step — HBM bandwidth is the scarce
    resource, not host RAM.

    Applies to 'control' leaves (including inside AND branches) whose pixel
    area is >= ``min_pixels`` (default 2048^2; MDU_HINT_UINT8=1 forces all,
    =0 disables).  Values are clipped to [0, 1] — the ControlNet hint range.
    """
    if cond is None:
        return None
    import os

    mode = os.environ.get("MDU_HINT_UINT8", "auto")
    if mode == "0":
        return cond
    if min_pixels is None:
        min_pixels = 0 if mode == "1" else 2048 * 2048

    def q(h):
        if h.dtype == jnp.uint8 or h.shape[-2] * h.shape[-1] < min_pixels:
            return h
        return jnp.round(jnp.clip(h, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    def walk(c):
        if c is None or callable(c):
            return c
        if isinstance(c, dict) and "__and__" in c:
            return {**c, "__and__": [walk(p) for p in c["__and__"]]}
        if isinstance(c, dict) and "control" in c and c["control"]:
            return {**c, "control": [q(h) for h in c["control"]]}
        return c

    return walk(cond)


def dequantize_hint(h: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Undo :func:`quantize_control_hints` at the consumption point."""
    if h.dtype == jnp.uint8:
        return h.astype(dtype) / 255.0
    return h.astype(dtype)


def fit_cond_canvases(cond: Optional[Cond],
                      latent_hw: Tuple[int, int]) -> Optional[Cond]:
    """Resize canvas-shaped guidance leaves to the generation canvas.

    'control' hints are brought to the pixel canvas (h*8, w*8) and
    'guidance' latents to the latent canvas (h, w); leaves already at
    canvas size pass through untouched.  This is what makes user-supplied
    hint images of arbitrary size work: _slice_leaf only recognizes a leaf
    as canvas-shaped when it matches exactly — a mismatched hint would
    silently broadcast as a per-tile repeat instead of being cropped per
    tile.  The reference delegates this resize to the external ControlNet
    extension (ref tile_methods/abstractdiffusion.py:471-478 builds hints
    at the generation size); here the pipeline normalizes at entry.
    """
    if cond is None:
        return None
    from ..ops.resize import resize_nchw

    h, w = latent_hw
    f = LATENT_TO_PIXEL

    def fit(leaf, target):
        if leaf.ndim != 4 or leaf.shape[2:] == target:
            return leaf
        x = dequantize_hint(leaf) if leaf.dtype == jnp.uint8 else leaf
        return resize_nchw(x, target, "linear")

    def walk(c):
        if c is None or callable(c):
            return c
        if isinstance(c, dict) and "__and__" in c:
            return {**c, "__and__": [walk(p) for p in c["__and__"]]}
        if not isinstance(c, dict):
            return c
        out = c
        if c.get("control"):
            out = {**out, "control": [fit(x, (h * f, w * f)) for x in c["control"]]}
        if c.get("guidance") is not None:
            out = {**out, "guidance": fit(c["guidance"], (h, w))}
        return out

    return walk(cond)


def _slice_leaf(leaf: jnp.ndarray, bboxes: Sequence[BBox], latent_hw: Tuple[int, int]):
    h, w = latent_hw
    if leaf.ndim == 4 and leaf.shape[2:] == (h, w):
        parts = [leaf[:, :, b.y:b.y + b.h, b.x:b.x + b.w] for b in bboxes]
        return jnp.concatenate(parts, axis=0)
    if leaf.ndim == 4 and leaf.shape[2:] == (h * LATENT_TO_PIXEL, w * LATENT_TO_PIXEL):
        f = LATENT_TO_PIXEL
        parts = [leaf[:, :, b.y * f:(b.y + b.h) * f, b.x * f:(b.x + b.w) * f] for b in bboxes]
        return jnp.concatenate(parts, axis=0)
    return jnp.concatenate([leaf] * len(bboxes), axis=0)


def tile_cond(cond: Optional[Cond], bboxes: Sequence[BBox],
              latent_hw: Tuple[int, int]) -> Optional[Cond]:
    """Build the cond pytree for a tile batch (tile-major on the batch axis)."""
    if cond is None:
        return None
    if isinstance(cond, dict) and "__and__" in cond:
        # composable (AND) conds: slice each branch, keep weights untouched
        return {"__and__": [tile_cond(p, bboxes, latent_hw) for p in cond["__and__"]],
                "__weights__": cond["__weights__"]}
    return jax.tree.map(lambda leaf: _slice_leaf(leaf, bboxes, latent_hw), cond)


def concat_conds(a: Cond, b: Cond) -> Cond:
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def _stack_leaf(leaf: jnp.ndarray, bboxes: Sequence[BBox], latent_hw: Tuple[int, int]):
    h, w = latent_hw
    T = len(bboxes)
    if leaf.ndim == 4 and leaf.shape[2:] == (h, w):
        return jnp.stack([leaf[:, :, b.y:b.y + b.h, b.x:b.x + b.w] for b in bboxes])
    if leaf.ndim == 4 and leaf.shape[2:] == (h * LATENT_TO_PIXEL, w * LATENT_TO_PIXEL):
        f = LATENT_TO_PIXEL
        return jnp.stack(
            [leaf[:, :, b.y * f:(b.y + b.h) * f, b.x * f:(b.x + b.w) * f] for b in bboxes])
    return jnp.broadcast_to(leaf[None], (T,) + leaf.shape)


def tile_cond_stacked(cond: Optional[Cond], bboxes: Sequence[BBox],
                      latent_hw: Tuple[int, int]) -> Optional[Cond]:
    """Like :func:`tile_cond` but with an explicit leading tile axis
    ``[T, B, ...]`` on every leaf — the form the mesh-sharded tile denoiser
    shards over the 'tiles' axis (parallel/ + tiling/schedulers.py).

    ``__weights__`` (static floats of AND conds) are stripped: shard_map
    in_specs trees must be arrays-only; the pipeline re-attaches them inside
    the shard body (they are trace-time constants).
    """
    if cond is None:
        return None
    if isinstance(cond, dict) and "__and__" in cond:
        return {"__and__": [tile_cond_stacked(p, bboxes, latent_hw)
                            for p in cond["__and__"]]}
    return jax.tree.map(lambda leaf: _stack_leaf(leaf, bboxes, latent_hw), cond)
