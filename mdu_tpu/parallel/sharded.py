"""Tile-data-parallelism: shard tile batches over the mesh.

TPU-native replacement for the reference's single-GPU tile batching
(ref abstractdiffusion.py:183-186): the stacked tile tensor [T, B, C, th, tw]
shards over the 'tiles' mesh axis via `shard_map`; each device denoises its
tile shard, scatters into a *partial* canvas with its tiles' (traced) bbox
offsets, and a single `psum` over ICI fuses the partial canvases — the
all-reduce formulation of scatter-add fusion (SURVEY.md §5).

For the tiled VAE the same sharding applies with the GroupNorm stats psum
handled by `TileContext(axis_name='tiles')` (ops/tile_context.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tiling.schedulers import DiffusionTilePlan


def _pad_tiles_to(n: int, arrs):
    """Pad leading (tile) axis to n by repeating the last entry."""
    out = []
    for a in arrs:
        pad = n - a.shape[0]
        if pad > 0:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
        out.append(a)
    return out


def make_sharded_tile_denoiser(
    mesh: Mesh,
    plan: DiffusionTilePlan,
    tile_denoise_flat: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
):
    """Build `denoised_fn(x, sigma, step)` with tiles sharded over the mesh.

    ``tile_denoise_flat(x_tiles [K,B,C,th,tw] -> same)`` is a per-shard
    denoiser (cond handling baked in by the caller; all tiles share cond).
    Supports grid tiles (regions run better unsharded — they are few).
    """
    from ..config import Method

    n_dev = mesh.shape["tiles"]
    T = len(plan.bboxes)
    T_pad = -(-T // n_dev) * n_dev
    is_mod = plan.method == Method.MIX_DIFF

    th, tw = plan.tile_h, plan.tile_w

    # per-tile scatter weight maps: MD = 1/0 contribution masks; MoD =
    # gaussian * global rescale sliced per tile (mixtureofdiffusers.py:125-126)
    if is_mod:
        rescale = np.where(plan.weights > 0,
                           1.0 / np.where(plan.weights > 0, plan.weights, 1.0), 0.0)
        gw = plan.tile_weights
        wmaps = np.stack([
            gw * rescale[0, 0, b.y:b.y + b.h, b.x:b.x + b.w] for b in plan.bboxes])
    else:
        wmaps = np.ones((T, th, tw), np.float32)
    wmaps = np.concatenate(
        [wmaps, np.zeros((T_pad - T, th, tw), np.float32)], axis=0).astype(np.float32)

    weights = jnp.asarray(plan.weights)

    def shard_body(tiles, wmap, sigma, step):
        # tiles [T_local, B, C, th, tw]; wmap [T_local, th, tw]
        out = tile_denoise_flat(tiles, sigma)
        return out * wmap[:, None, None]

    # Bitwise-deterministic fusion: the shard_map returns denoised tiles
    # (sharded) instead of psum-ing partial canvases — psum's cross-device
    # accumulation order is topology-dependent.  The scatter-add below runs
    # replicated in bbox order, the exact op sequence of the single-device
    # path, so results are bitwise identical for any device count (see
    # tiling/schedulers.py::_make_sharded_grid).
    sharded = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(P("tiles"), P("tiles"), P(), P()),
        out_specs=P("tiles"),
    )

    def denoised_fn(x, sigma, step):
        B, C, H, W = x.shape
        tiles = jnp.stack([
            jax.lax.slice(x, (0, 0, b.y, b.x), (B, C, b.y + th, b.x + tw))
            for b in plan.bboxes])
        tiles, = _pad_tiles_to(T_pad, [tiles])
        out = sharded(tiles, jnp.asarray(wmaps), sigma, step)
        buf = jnp.zeros_like(x)
        for t, b in enumerate(plan.bboxes):
            buf = buf.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(out[t])
        if is_mod:
            return buf                       # weights pre-normalized into wmaps
        return jnp.where(weights > 1, buf / weights, buf)

    return denoised_fn


def shard_vae_tiles(mesh: Mesh, num_tiles: int) -> Tuple[int, NamedSharding]:
    """Padded tile count + sharding for lockstep tiled-VAE over the mesh."""
    n_dev = mesh.shape["tiles"]
    t_pad = -(-num_tiles // n_dev) * n_dev
    return t_pad, NamedSharding(mesh, P("tiles"))


def _sharded_tiled_vae(mesh: Mesh, vae, params: Any, x: jnp.ndarray,
                       which: str, tile_size: int) -> Optional[jnp.ndarray]:
    """Tile-sharded exact tiled-VAE encode/decode: tiles split over the mesh,
    the GroupNorm statistics pooled by `psum` over ICI
    (TileContext.axis_name).  Returns None when tiling is unnecessary.

    Padding tiles (repeats of the last tile) carry zero owned-region masks,
    so they contribute nothing to the pooled statistics or the output.
    """
    from ..ops.tile_context import TileContext
    from ..tiling.tiled_vae import (
        DECODER_PAD,
        ENCODER_PAD,
        _gather_plan_tiles,
        _scatter_owned,
        plan_vae_tiles,
    )

    decode = which == "decoder"
    pad = DECODER_PAD if decode else ENCODER_PAD
    B = x.shape[0]
    plan = plan_vae_tiles(x.shape[2], x.shape[3], tile_size, pad)
    if plan is None:
        return None

    n_dev = mesh.shape["tiles"]
    T = plan.num_tiles
    T_pad = -(-T // n_dev) * n_dev

    tiles = _gather_plan_tiles(x, plan)                 # [T*B, C, th, tw]
    masks = np.asarray(plan.local_masks())              # [T, 1, th, tw]
    if T_pad > T:
        reps = T_pad - T
        tiles = jnp.concatenate(
            [tiles, jnp.concatenate([tiles[-B:]] * reps, axis=0)], axis=0)
        masks = np.concatenate(
            [masks, np.zeros((reps,) + masks.shape[1:], np.float32)], axis=0)
    masks = jnp.asarray(masks)

    t_local = T_pad // n_dev
    method = vae.decode if decode else vae.encode_moments

    def body(p, tile_shard, mask_shard):
        ctx = TileContext(t_local, (plan.in_h, plan.in_w), mask_shard,
                          axis_name="tiles")
        return vae.apply(p, tile_shard, ctx, method=method)

    out = jax.shard_map(body, mesh=mesh,
                        in_specs=(P(), P("tiles"), P("tiles")),
                        out_specs=P("tiles"))(params, tiles, masks)
    if decode:
        return _scatter_owned(out[: T * B], plan, 8, 1, vae.cfg.out_channels, B)
    return _scatter_owned(out[: T * B], plan, 1, 8,
                          2 * vae.cfg.latent_channels, B)


def sharded_tiled_vae_decode(
    mesh: Mesh, vae, params: Any, z: jnp.ndarray, tile_size: int = 96,
) -> jnp.ndarray:
    out = _sharded_tiled_vae(mesh, vae, params, z, "decoder", tile_size)
    if out is None:
        return vae.apply(params, z, method=vae.decode)
    return out


def sharded_tiled_vae_encode_moments(
    mesh: Mesh, vae, params: Any, x: jnp.ndarray, tile_size: int = 1536,
) -> jnp.ndarray:
    out = _sharded_tiled_vae(mesh, vae, params, x, "encoder", tile_size)
    if out is None:
        return vae.apply(params, x, method=vae.encode_moments)
    return out
