"""Tiled-diffusion schedulers: MultiDiffusion and Mixture of Diffusers.

TPU-native re-design of ref tile_methods/multidiffusion.py and
tile_methods/mixtureofdiffusers.py.  The reference monkey-patches sampler
internals; here a *tile scheduler is a combinator*: it takes per-tile
denoise callables and returns a `denoised_fn(x, sigma, step)` the samplers
consume (SURVEY.md §7 architecture translation).

Because CFG is linear, fusing after CFG (here) is identical to the
reference's mixed hook depths (above-CFG for MultiDiffusion, below-CFG for
MoD) — see samplers/denoiser.py.

Fusion math parity:
  * MultiDiffusion: scatter-add tile outputs, divide by paint counts
    ``where(w > 1, buf / w, buf)`` (multidiffusion.py:208); BACKGROUND
    regions add +1 weight (:44-46); FOREGROUND regions feather-blend
    (:189-216).
  * MoD: per-tile gaussian weights times the precomputed global rescale
    ``1/sum(weights)`` applied at scatter; no final divide
    (mixtureofdiffusers.py:29-36, 125-126); custom BACKGROUND bboxes carry
    their own gaussian weights (:45-55).

All geometry is static; the per-batch loop unrolls at trace time so every
UNet call compiles once per tile-batch shape.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Method
from ..utils.bbox import BBox, BlendMode, RegionBBox, RegionSpec
from ..utils.grid import batch_bboxes, clamp_overlap, paint_count, split_grid
from ..utils.weights import feather_mask, gaussian_weights
from ..ops.fusion import feather_blend, gather_tiles, weighted_average

# tile_denoise(x_tiles [K*B,C,th,tw], sigma, step, bboxes, batch_idx) -> same shape
TileDenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, Sequence[BBox], int], jnp.ndarray]
# region_denoise(x_tile [B,C,rh,rw], sigma, step, region_idx) -> same shape
RegionDenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, int], jnp.ndarray]
# org_fn(x, sigma, step) -> x-shaped (non-tiled passthrough, e.g. highres leg)
OrgFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclass(frozen=True)
class DiffusionTilePlan:
    """Static latent-canvas tiling plan shared by MD and MoD."""

    method: str
    h: int
    w: int
    tile_h: int
    tile_w: int
    overlap: int
    tile_bs: int
    draw_background: bool = True
    bboxes: Tuple[BBox, ...] = ()
    batched: Tuple[Tuple[BBox, ...], ...] = ()
    regions: Tuple[RegionBBox, ...] = ()
    weights: Optional[np.ndarray] = None          # [1,1,h,w]
    tile_weights: Optional[np.ndarray] = None     # [th,tw] gaussian (MoD)
    region_weights: Tuple[Optional[np.ndarray], ...] = ()  # MoD custom BG

    @property
    def num_batches(self) -> int:
        return len(self.batched)

    def cache_key(self):
        """Hashable geometry key for jit-executable caching."""
        return (self.method, self.h, self.w, self.tile_h, self.tile_w,
                self.overlap, self.tile_bs, self.draw_background,
                self.bboxes, self.regions)

    @property
    def total_units(self) -> int:
        """Progress units per sampling step (ref abstractdiffusion.py:112-115)."""
        return self.num_batches + len(self.regions)


def plan_tiled_diffusion(
    method: str,
    latent_h: int,
    latent_w: int,
    tile_h: int = 96,
    tile_w: int = 96,
    overlap: int = 48,
    tile_bs: int = 4,
    regions: Sequence[RegionSpec] = (),
    draw_background: bool = True,
) -> DiffusionTilePlan:
    """Build the static tile plan (ref init_grid_bbox/init_custom_bbox,
    abstractdiffusion.py:172-229 + method-specific weight init)."""
    tile_h = min(tile_h, latent_h)
    tile_w = min(tile_w, latent_w)
    overlap = clamp_overlap(tile_w, tile_h, overlap)

    import os
    max_regions = int(os.environ.get("MDU_MAX_REGIONS", "8"))
    valid = [r for r in regions if r.validate()]
    if len(valid) > max_regions:
        import sys
        print(f"[Tiled Diffusion] warning: {len(valid)} regions exceeds "
              f"MDU_MAX_REGIONS={max_regions}; extra regions dropped "
              "(ref --md_max_regions)", file=sys.stderr)
        valid = valid[:max_regions]
    region_bboxes = tuple(r.to_bbox(latent_w, latent_h) for r in valid)
    for i, r in enumerate(region_bboxes):
        if r.w * r.h > 0.25 * latent_w * latent_h:
            import sys
            print(f"[Tiled Diffusion] warning: region {i + 1} covers "
                  f"{100 * r.w * r.h / (latent_w * latent_h):.0f}% of the canvas"
                  " — expect high HBM use (ref bboxHint.js VRAM warning)",
                  file=sys.stderr)
    if not region_bboxes:
        draw_background = True  # nothing else to paint

    bboxes: Tuple[BBox, ...] = ()
    batched: Tuple[Tuple[BBox, ...], ...] = ()
    weights = np.zeros((1, 1, latent_h, latent_w), np.float32)
    tile_weights = None
    if draw_background:
        grid = split_grid(latent_w, latent_h, tile_w, tile_h, overlap)
        bboxes = tuple(grid)
        batched = tuple(tuple(b) for b in batch_bboxes(grid, tile_bs))
        if method == Method.MIX_DIFF:
            tile_weights = gaussian_weights(tile_w, tile_h)
            weights += paint_count(latent_w, latent_h, grid, tile_weights)
        else:
            weights += paint_count(latent_w, latent_h, grid, 1.0)

    region_weights: List[Optional[np.ndarray]] = []
    for r in region_bboxes:
        if r.blend_mode == BlendMode.BACKGROUND:
            if method == Method.MIX_DIFF:
                gw = gaussian_weights(r.w, r.h)
                weights[:, :, r.y:r.y + r.h, r.x:r.x + r.w] += gw
                region_weights.append(gw)
            else:
                weights[:, :, r.y:r.y + r.h, r.x:r.x + r.w] += 1.0
                region_weights.append(None)
        else:
            region_weights.append(None)

    return DiffusionTilePlan(
        method=method, h=latent_h, w=latent_w, tile_h=tile_h, tile_w=tile_w,
        overlap=overlap, tile_bs=tile_bs, draw_background=draw_background,
        bboxes=bboxes, batched=batched, regions=region_bboxes,
        weights=weights, tile_weights=tile_weights,
        region_weights=tuple(region_weights))


def _use_fused_blend() -> bool:
    """Opt-in Pallas fused tile blend (MDU_FUSED_BLEND=1, TPU only)."""
    import os

    if os.environ.get("MDU_FUSED_BLEND") != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def make_tiled_denoiser(
    plan: DiffusionTilePlan,
    tile_denoise: TileDenoiseFn,
    region_denoise: Optional[RegionDenoiseFn] = None,
    org_fn: Optional[OrgFn] = None,
):
    """Build `denoised_fn(x, sigma, step)` fusing per-tile denoising.

    Mirrors sample_one_step (multidiffusion.py:131-218) /
    apply_model_hijack (mixtureofdiffusers.py:61-179).
    """
    is_mod = plan.method == Method.MIX_DIFF
    weights = jnp.asarray(plan.weights)
    # exact reciprocal where painted; 0 where unpainted (the reference
    # divides by the raw weights, mixtureofdiffusers.py:32 — flooring
    # would break partition-of-unity at deep gaussian tails)
    rescale = (np.where(plan.weights > 0, 1.0 / np.where(plan.weights > 0, plan.weights, 1.0), 0.0)
               if is_mod else None)

    # precompute per-tile scatter weights for MoD: gaussian * rescale[bbox]
    per_tile_w: List[Optional[jnp.ndarray]] = []
    if is_mod and plan.draw_background:
        for b in plan.bboxes:
            wmap = plan.tile_weights * rescale[0, 0, b.y:b.y + b.h, b.x:b.x + b.w]
            per_tile_w.append(jnp.asarray(wmap[None, None]))
    region_scatter_w: List[Optional[jnp.ndarray]] = []
    for r, gw in zip(plan.regions, plan.region_weights):
        if is_mod and r.blend_mode == BlendMode.BACKGROUND:
            wmap = gw * rescale[0, 0, r.y:r.y + r.h, r.x:r.x + r.w]
            region_scatter_w.append(jnp.asarray(wmap[None, None]))
        else:
            region_scatter_w.append(None)
    feathers = {
        i: jnp.asarray(feather_mask(r.w, r.h, r.feather_ratio)[None, None])
        for i, r in enumerate(plan.regions) if r.blend_mode == BlendMode.FOREGROUND
    }

    def denoised_fn(x: jnp.ndarray, sigma: jnp.ndarray, step: jnp.ndarray) -> jnp.ndarray:
        B, C, H, W = x.shape
        if (H, W) != (plan.h, plan.w):
            if org_fn is None:
                raise ValueError(
                    f"input {H}x{W} does not match tile plan {plan.h}x{plan.w}"
                    " and no org_fn passthrough was provided")
            return org_fn(x, sigma, step)

        buf = jnp.zeros_like(x)
        fused_grid = (not is_mod and not plan.regions and plan.draw_background
                      and _use_fused_blend())

        if plan.draw_background:
            tidx = 0
            all_out = [] if fused_grid else None
            for batch_i, bboxes in enumerate(plan.batched):
                tiles = gather_tiles(x, bboxes)          # [K, B, C, th, tw]
                K = tiles.shape[0]
                flat = tiles.reshape(K * B, C, plan.tile_h, plan.tile_w)
                out = tile_denoise(flat, sigma, step, bboxes, batch_i)
                out = out.reshape(K, B, C, plan.tile_h, plan.tile_w)
                if fused_grid:
                    all_out.append(out)
                    tidx += len(bboxes)
                    continue
                for k, b in enumerate(bboxes):
                    t = out[k]
                    if is_mod:
                        t = t * per_tile_w[tidx + k]
                    buf = buf.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(t)
                tidx += len(bboxes)

            if fused_grid:
                from ..ops.pallas import fused_tile_blend

                stacked = jnp.concatenate(all_out, axis=0)   # [T, B, C, th, tw]
                T = stacked.shape[0]
                folded = stacked.reshape(T, B * C, plan.tile_h, plan.tile_w)
                fused = fused_tile_blend(folded, weights[0, 0], plan.h, plan.w,
                                         plan.bboxes)
                return fused.reshape(B, C, plan.h, plan.w)

        feather_buf = feather_msk = feather_cnt = None
        for i, r in enumerate(plan.regions):
            xt = x[:, :, r.y:r.y + r.h, r.x:r.x + r.w]
            out = region_denoise(xt, sigma, step, i)
            if r.blend_mode == BlendMode.BACKGROUND:
                if is_mod:
                    out = out * region_scatter_w[i]
                buf = buf.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(out)
            else:
                if feather_buf is None:
                    feather_buf = jnp.zeros_like(buf)
                    feather_msk = jnp.zeros((1, 1, H, W), jnp.float32)
                    feather_cnt = jnp.zeros((1, 1, H, W), jnp.float32)
                feather_buf = feather_buf.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(out)
                feather_msk = feather_msk.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(feathers[i])
                feather_cnt = feather_cnt.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(1.0)

        if is_mod:
            x_out = buf                                  # weights pre-normalized
        else:
            x_out = weighted_average(buf, weights)

        if feather_buf is not None:
            x_out = feather_blend(x_out, feather_buf, feather_msk, feather_cnt)
        return x_out

    return denoised_fn
