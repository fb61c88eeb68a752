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
    # pad every tile batch to exactly tile_bs (bitwise topology invariance;
    # see TiledDiffusionConfig.deterministic)
    uniform_batches: bool = False
    # lax.scan over tile batches instead of trace-time unrolling (compile
    # cost O(1) in tile count; see TiledDiffusionConfig.tile_scan)
    scan_tiles: bool = False

    @property
    def num_batches(self) -> int:
        return len(self.batched)

    def cache_key(self):
        """Hashable geometry key for jit-executable caching."""
        return (self.method, self.h, self.w, self.tile_h, self.tile_w,
                self.overlap, self.tile_bs, self.draw_background,
                self.bboxes, self.regions, self.uniform_batches,
                self.scan_tiles)

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
    uniform_batches: bool = False,
    tile_scan: Optional[bool] = None,
) -> DiffusionTilePlan:
    """Build the static tile plan (ref init_grid_bbox/init_custom_bbox,
    abstractdiffusion.py:172-229 + method-specific weight init)."""
    tile_h = min(tile_h, latent_h)
    tile_w = min(tile_w, latent_w)
    overlap = clamp_overlap(tile_w, tile_h, overlap)

    import os
    # ref tilediffusion.py:81 defaults --md_max_regions to 16
    max_regions = int(os.environ.get("MDU_MAX_REGIONS", "16"))
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
        region_weights=tuple(region_weights),
        uniform_batches=uniform_batches,
        scan_tiles=_resolve_tile_scan(tile_scan, len(batched), uniform_batches))


def _resolve_tile_scan(tile_scan: Optional[bool], n_batches: int,
                       uniform_batches: bool) -> bool:
    """None = auto: scan once the batch count reaches the threshold where
    trace-time unrolling starts to dominate compile time.  Deterministic
    (uniform_batches) runs stay unrolled — the bitwise sharded==single claim
    is proven for that program shape."""
    import os

    if uniform_batches:
        return False
    if tile_scan is not None:
        return bool(tile_scan) and n_batches > 1
    thresh = int(os.environ.get("MDU_TILE_SCAN_THRESHOLD", "8"))
    return n_batches >= thresh


def _use_fused_blend():
    """Pallas fused tile blend dispatch -> (enabled, interpret).

    OFF by default after the on-chip A/B (v5e, 2026-08-16): XLA lowers the
    static-offset scatter-add to 0.015 ms and the matching gather to
    0.046 ms per step — 0.03% of the 174 ms panorama denoise step, already
    at the bandwidth roofline.  The gather-formulated kernel cannot pay for
    itself here (and its dynamic window alignment crashes the remote Mosaic
    compiler); it remains available for experimentation.
    MDU_FUSED_BLEND=1 enables on TPU; =interp forces interpret mode on any
    backend (CI parity tests)."""
    import os

    v = os.environ.get("MDU_FUSED_BLEND", "0")
    if v == "interp":
        return True, True
    if v != "1":
        return False, False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon"), False
    except Exception:
        return False, False


def make_tiled_denoiser(
    plan: DiffusionTilePlan,
    tile_denoise: TileDenoiseFn,
    region_denoise: Optional[RegionDenoiseFn] = None,
    org_fn: Optional[OrgFn] = None,
    mesh=None,
    sharded_tile_denoise=None,
    tile_conds_fn=None,
    stateful: bool = False,
):
    """Build `denoised_fn(x, sigma, step)` fusing per-tile denoising.

    Mirrors sample_one_step (multidiffusion.py:131-218) /
    apply_model_hijack (mixtureofdiffusers.py:61-179).

    When ``mesh`` (with a 'tiles' axis) and ``sharded_tile_denoise`` are
    given, the grid tiles shard over the mesh: each device denoises its tile
    shard (in tile_bs-sized chunks), scatter-adds into a partial canvas, and
    one ``psum`` over ICI fuses the partials — the all-reduce formulation of
    the reference's sequential scatter loop (multidiffusion.py:166-167).
    ``sharded_tile_denoise(flat, sigma, step, conds)`` consumes the local
    shard with per-tile conds pre-sliced by ``tile_conds_fn(step)`` (a
    pytree whose every leaf has leading tile axis [T, B, ...], built with
    tiling/conds.py::tile_cond_stacked).  Regions stay replicated — they are
    few and each may use its own params/LoRA.

    ``stateful=True`` (DeepCache feature caching): ``tile_denoise`` takes an
    extra per-batch ``cache`` arg and returns ``(out, cache)``; the built
    ``denoised_fn(x, sigma, step, aux)`` threads ``aux`` (a tuple of
    per-batch caches for the unrolled grid; one stacked per-chunk array for
    the lax.scan grid — in that case ``tile_denoise`` must be the flat
    stateful contract ``sharded_tile_denoise(flat, sigma, step, conds,
    cache)``) and returns ``(x_out, aux)``.  Regions and the org_fn
    passthrough always run the full model — caching accelerates the
    background grid only (regions are the user-emphasized areas).  With a
    ``mesh``, the caches shard over the 'tiles' axis alongside their tiles
    (one uniform ``[n_dev*n_local_chunks, mult*tile_bs*B, ...]`` array —
    see _make_sharded_grid).
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
    ptw_np = None
    if is_mod and plan.draw_background:
        ptw_np = np.stack([
            plan.tile_weights * rescale[0, 0, b.y:b.y + b.h, b.x:b.x + b.w]
            for b in plan.bboxes]).astype(np.float32)
        per_tile_w = [jnp.asarray(w[None, None]) for w in ptw_np]
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

    use_sharded = (mesh is not None and sharded_tile_denoise is not None
                   and plan.draw_background and len(plan.bboxes) > 0)
    sharded_grid = None
    if use_sharded:
        sharded_grid = _make_sharded_grid(
            plan, mesh, sharded_tile_denoise, tile_conds_fn, ptw_np,
            stateful=stateful)
    use_scan = (not use_sharded and plan.scan_tiles and plan.draw_background
                and len(plan.batched) > 1 and sharded_tile_denoise is not None
                and tile_conds_fn is not None)
    scan_grid = None
    if use_scan:
        scan_grid = _make_scan_grid(plan, sharded_tile_denoise, tile_conds_fn,
                                    ptw_np, stateful=stateful)

    def denoised_core(x: jnp.ndarray, sigma: jnp.ndarray, step: jnp.ndarray,
                      aux):
        B, C, H, W = x.shape
        if (H, W) != (plan.h, plan.w):
            if org_fn is None:
                raise ValueError(
                    f"input {H}x{W} does not match tile plan {plan.h}x{plan.w}"
                    " and no org_fn passthrough was provided")
            return org_fn(x, sigma, step), aux

        buf = jnp.zeros_like(x)
        fused_on, fused_interp = _use_fused_blend()
        fused_grid = (plan.draw_background and not use_sharded and fused_on
                      and not stateful)
        new_caches = []

        scan_cache = None
        shard_cache = None
        if use_sharded:
            if stateful:
                buf, shard_cache = sharded_grid(x, sigma, step, aux)
            else:
                buf = sharded_grid(x, sigma, step)
        elif use_scan:
            if stateful:
                buf, scan_cache = scan_grid(x, sigma, step, aux)
            else:
                buf = scan_grid(x, sigma, step)
        elif plan.draw_background:
            tidx = 0
            all_out = [] if fused_grid else None
            for batch_i, bboxes in enumerate(plan.batched):
                tiles = gather_tiles(x, bboxes)          # [K, B, C, th, tw]
                K = tiles.shape[0]
                Kp = plan.tile_bs if plan.uniform_batches else K
                call_bboxes = bboxes
                if Kp > K:
                    # deterministic mode: pad the ragged batch to tile_bs so
                    # every UNet call compiles to one shape — bitwise equal
                    # to the sharded path's identically-padded chunks
                    tiles = jnp.concatenate(
                        [tiles, jnp.repeat(tiles[-1:], Kp - K, axis=0)], axis=0)
                    call_bboxes = tuple(bboxes) + (bboxes[-1],) * (Kp - K)
                flat = tiles.reshape(Kp * B, C, plan.tile_h, plan.tile_w)
                if stateful:
                    out, ncache = tile_denoise(flat, sigma, step, call_bboxes,
                                               batch_i, aux[batch_i])
                    new_caches.append(ncache)
                else:
                    out = tile_denoise(flat, sigma, step, call_bboxes, batch_i)
                out = out.reshape(Kp, B, C, plan.tile_h, plan.tile_w)[:K]
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
                if is_mod:
                    # MoD tiles carry gaussian x 1/sum-weights maps
                    stacked = stacked * jnp.asarray(ptw_np)[:, None, None]
                T = stacked.shape[0]
                folded = stacked.reshape(T, B * C, plan.tile_h, plan.tile_w)
                # raw sum only: MD's divide (and region adds) happen below
                buf = fused_tile_blend(folded, weights[0, 0], plan.h, plan.w,
                                       plan.bboxes, normalize=False,
                                       interpret=fused_interp
                                       ).reshape(B, C, plan.h, plan.w)

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
        if not stateful:
            return x_out, aux
        if use_sharded:
            return x_out, shard_cache
        return x_out, (scan_cache if use_scan else tuple(new_caches))

    if stateful:
        return denoised_core

    def denoised_fn(x, sigma, step):
        return denoised_core(x, sigma, step, None)[0]

    return denoised_fn


def _make_scan_grid(plan: DiffusionTilePlan, tile_denoise_flat, tile_conds_fn,
                    ptw_np: Optional[np.ndarray], stateful: bool = False):
    """Grid-tile fusion as a ``lax.scan`` over uniform tile chunks.

    The trace-time-unrolled batch loop above inlines one UNet graph per tile
    batch — fine at panorama scale (3-7 batches), hopeless at 8K where a
    1024x1024 latent canvas has ~144 tiles = 18 batches (the reference pays
    nothing for its Python loop because torch re-dispatches eagerly,
    multidiffusion.py:131-218; under XLA the loop must live *inside* the
    compiled program).  Here every chunk is padded to exactly ``tile_bs``
    tiles, so the scan body — dynamic-slice gather, one UNet call, multiply
    by the per-tile scatter weights, sequential dynamic-update-slice
    accumulate — compiles ONCE for any tile count.

    Consumes the same contract as the mesh-sharded grid:
    ``tile_denoise_flat(flat, sigma, step, conds)`` with per-tile conds
    pre-stacked by ``tile_conds_fn(step)`` on a leading [T, B, ...] axis
    (tiling/conds.py::tile_cond_stacked).  Returns the accumulated canvas
    (MultiDiffusion: raw sums awaiting the weight divide; MoD:
    pre-normalized via the gaussian x 1/sum-weights maps).

    ``stateful=True`` (DeepCache): ``tile_denoise_flat(flat, sigma, step,
    conds, cache)`` returns ``(out, new_cache)``; the per-chunk feature
    caches ride the scan as xs -> ys — every chunk is padded to exactly
    ``tile_bs`` tiles, so the stacked cache is one uniform
    ``[n_chunks, mult*tile_bs*B, C', h', w']`` array
    (pipeline._deepcache_aux builds it) and ``grid_buf(x, sigma, step, aux)``
    returns ``(buf, new_aux)``.
    """
    import jax

    T = len(plan.bboxes)
    bs = plan.tile_bs
    n_chunks = -(-T // bs)
    Tp = n_chunks * bs
    th, tw = plan.tile_h, plan.tile_w

    offs = np.array([[b.y, b.x] for b in plan.bboxes], np.int32)
    offs = np.concatenate([offs, np.repeat(offs[-1:], Tp - T, axis=0)], axis=0)
    wmaps = (ptw_np.astype(np.float32) if ptw_np is not None
             else np.ones((T, th, tw), np.float32))
    # padding tiles carry zero weight: they gather real data (repeat of the
    # last bbox) but contribute nothing to the canvas
    wmaps = np.concatenate(
        [wmaps, np.zeros((Tp - T, th, tw), np.float32)], axis=0)
    offs_c = offs.reshape(n_chunks, bs, 2)
    wmaps_c = wmaps.reshape(n_chunks, bs, th, tw)

    def grid_buf(x, sigma, step, aux=None):
        B, C = x.shape[0], x.shape[1]
        conds = tile_conds_fn(step) if tile_conds_fn is not None else None

        def pad_chunk(l):
            if Tp != T:
                l = jnp.concatenate(
                    [l, jnp.repeat(l[-1:], Tp - T, axis=0)], axis=0)
            return l.reshape((n_chunks, bs) + l.shape[1:])

        conds = jax.tree.map(pad_chunk, conds)

        def body(buf, inp):
            if stateful:
                o, wm, cc, cache = inp
            else:
                o, wm, cc = inp     # [bs,2] i32, [bs,th,tw] f32, pytree [bs,B,...]
            tiles = jnp.stack([
                jax.lax.dynamic_slice(x, (0, 0, o[k, 0], o[k, 1]),
                                      (B, C, th, tw))
                for k in range(bs)])
            flat = tiles.reshape(bs * B, C, th, tw)
            cflat = jax.tree.map(
                lambda l: l.reshape((bs * l.shape[1],) + l.shape[2:]), cc)
            new_cache = None
            if stateful:
                out, new_cache = tile_denoise_flat(flat, sigma, step, cflat,
                                                   cache)
            else:
                out = tile_denoise_flat(flat, sigma, step, cflat)
            out = out.reshape(bs, B, C, th, tw) * wm[:, None, None]
            out = out.astype(buf.dtype)
            # sequential accumulate: tiles inside one chunk may overlap
            for k in range(bs):
                cur = jax.lax.dynamic_slice(
                    buf, (0, 0, o[k, 0], o[k, 1]), (B, C, th, tw))
                buf = jax.lax.dynamic_update_slice(
                    buf, cur + out[k], (0, 0, o[k, 0], o[k, 1]))
            return buf, new_cache

        xs = (jnp.asarray(offs_c), jnp.asarray(wmaps_c), conds)
        if stateful:
            xs = xs + (aux,)
        buf, new_aux = jax.lax.scan(body, jnp.zeros_like(x), xs)
        return (buf, new_aux) if stateful else buf

    return grid_buf


def _make_sharded_grid(plan: DiffusionTilePlan, mesh, sharded_tile_denoise,
                       tile_conds_fn, ptw_np: Optional[np.ndarray],
                       stateful: bool = False):
    """Grid-tile fusion sharded over the mesh 'tiles' axis.

    Returns ``grid_buf(x, sigma, step) -> [B,C,h,w]`` — the *accumulated*
    canvas (MultiDiffusion: raw scatter-add sums awaiting the weight divide;
    MoD: pre-normalized).

    ``stateful=True`` (DeepCache x mesh): ``sharded_tile_denoise(flat,
    sigma, step, conds, cache) -> (out, new_cache)`` and the per-chunk
    feature caches shard over the mesh with the tiles they belong to —
    ``aux`` is one uniform ``[n_dev * n_local_chunks, mult*tile_bs*B, ...]``
    array (pipeline._deepcache_aux builds it), in_specs/out_specs
    ``P('tiles')``, so each device carries the cache for exactly its own
    tile shard across steps (tile->device assignment is static).  Chunks
    are always padded to ``tile_bs`` in this mode: the stacked cache needs
    one uniform call shape.

    **Bitwise-deterministic fusion** (BASELINE.md north star): the UNet work
    shards over the mesh, but the shard_map returns the *denoised tiles*
    (out_specs sharded on the tile axis) rather than psum-ing partial
    canvases — psum's cross-device accumulation order depends on topology
    and regroups float adds.  The scatter-add then runs replicated, in bbox
    order, with exactly the op sequence of the single-device loop above, so
    the *fusion* is bitwise identical to the single-device result and
    invariant to device count (XLA inserts the all_gather at the sharding
    boundary; gathering T tiles costs the same traffic class as psum-ing
    n_dev canvases at SD overlap ratios).

    End-to-end bitwise equality additionally needs every UNet call to
    compile to the same program: XLA is not batch-shape invariant at the
    last ulp, and the per-device chunking can leave a different ragged tail
    than the single-device batching.  ``plan.uniform_batches`` (the
    ``deterministic`` config flag) pads every chunk to exactly ``tile_bs``
    on both paths, which makes sharded == single-device bitwise for any
    device count (asserted by tests/test_sharded_pipeline.py).
    """
    import jax
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["tiles"]
    T = len(plan.bboxes)
    T_pad = -(-T // n_dev) * n_dev
    t_local = T_pad // n_dev
    th, tw = plan.tile_h, plan.tile_w

    def _pad_tiles(a):
        if T_pad == T:
            return a
        return jnp.concatenate([a, jnp.repeat(a[-1:], T_pad - T, axis=0)], axis=0)

    def grid_buf(x, sigma, step, aux=None):
        from ..ops.fusion import gather_tiles

        B, C = x.shape[0], x.shape[1]
        tiles = _pad_tiles(gather_tiles(x, plan.bboxes))       # [T_pad,B,C,th,tw]
        conds = tile_conds_fn(step) if tile_conds_fn is not None else None
        conds = jax.tree.map(_pad_tiles, conds)
        cond_specs = jax.tree.map(lambda _: P("tiles"), conds)

        def body(tiles_l, conds_l, cache_l=None):
            # tiles_l [t_local,B,C,th,tw]; sigma/step/params enter by closure
            # (replicated).  Denoise in tile_bs-sized chunks to bound HBM —
            # the same per-call batch the unsharded path uses.
            outs, ncaches = [], []
            for ci, s0 in enumerate(range(0, t_local, plan.tile_bs)):
                s1 = min(t_local, s0 + plan.tile_bs)
                k = s1 - s0
                kp = plan.tile_bs if (plan.uniform_batches or stateful) else k
                chunk = tiles_l[s0:s1]
                # explicit leading size: -1 can't be inferred for
                # zero-element leaves (e.g. a [.,0,h,w] txt2img concat)
                cchunk = jax.tree.map(lambda l, a=s0, b=s1: l[a:b], conds_l)
                if kp > k:
                    # deterministic mode: uniform tile_bs batch, same shape
                    # as the single-device path's padded calls
                    chunk = jnp.concatenate(
                        [chunk, jnp.repeat(chunk[-1:], kp - k, axis=0)], axis=0)
                    cchunk = jax.tree.map(
                        lambda l: jnp.concatenate(
                            [l, jnp.repeat(l[-1:], kp - k, axis=0)], axis=0),
                        cchunk)
                flat = chunk.reshape(kp * B, C, th, tw)
                cchunk = jax.tree.map(
                    lambda l: l.reshape((kp * l.shape[1],) + l.shape[2:]), cchunk)
                if stateful:
                    out, nc = sharded_tile_denoise(flat, sigma, step, cchunk,
                                                   cache_l[ci])
                    ncaches.append(nc)
                else:
                    out = sharded_tile_denoise(flat, sigma, step, cchunk)
                outs.append(out.reshape(kp, B, C, th, tw)[:k])
            out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            if stateful:
                return out, jnp.stack(ncaches)
            return out

        if stateful:
            out, new_aux = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("tiles"), cond_specs, P("tiles")),
                out_specs=(P("tiles"), P("tiles")),
            )(tiles, conds, aux)
        else:
            out = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("tiles"), cond_specs),
                out_specs=P("tiles"),
            )(tiles, conds)

        # Replicated scatter-add in bbox order == the single-device loop,
        # including the MoD per-tile weight multiply placed at the SAME
        # program point (multiply-then-add here, not inside the shard_map:
        # XLA's FMA contraction choices depend on the op's surroundings, and
        # splitting the pattern across the shard boundary produced last-ulp
        # differences on CPU).
        buf = jnp.zeros_like(x)
        for t, b in enumerate(plan.bboxes):
            tile = out[t]
            if ptw_np is not None:
                tile = tile * jnp.asarray(ptw_np[t][None, None])
            buf = buf.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(tile)
        if stateful:
            return buf, new_aux
        return buf

    return grid_buf
