"""TileContext — threads cross-tile GroupNorm pooling through a model.

This object replaces the reference's task-queue suspension machinery
(ref scripts/tilevae.py:585-652): when VAE tiles run *lockstep-batched* on
the leading axis, a GroupNorm with global statistics is just a masked
reduction over the tile axis — inline, in one forward pass.  When the tile
axis is sharded over a mesh, the same reduction adds a `psum` over
``axis_name`` (the one true cross-tile collective, SURVEY.md §5).

``masks`` carries each tile's *owned* (crop-valid) region at the base
resolution; `mask_for` derives the mask at any up/down-sampled resolution by
exact index subsampling/repetition, which preserves the partition-of-unity
property as long as tile origins are aligned to the total downsample factor
(the tile planner guarantees this).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TileContext:
    num_tiles: int                      # tiles in the *local* shard
    base_hw: tuple                      # (h, w) of the mask's native resolution
    masks: Optional[jnp.ndarray] = None  # [T, 1, h, w] 0/1 owned-region masks
    axis_name: Optional[str] = None     # mesh axis the tile dim is sharded over
    reference_pooling: bool = False     # emulate ref's biased-var averaging

    def mask_for(self, h: int, w: int) -> Optional[jnp.ndarray]:
        """Owned-region masks at resolution (h, w), derived exactly."""
        if self.masks is None:
            return None
        bh, bw = self.base_hw
        if (h, w) == (bh, bw):
            return self.masks
        if bh % h == 0 and bw % w == 0:          # downsampled by integer stride
            sh, sw = bh // h, bw // w
            return self.masks[:, :, ::sh, ::sw]
        if h % bh == 0 and w % bw == 0:          # upsampled by integer factor
            fh, fw = h // bh, w // bw
            return jnp.repeat(jnp.repeat(self.masks, fh, axis=2), fw, axis=3)
        raise ValueError(f"mask resolution {(h, w)} incompatible with base {self.base_hw}")


def tile_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    ctx: Optional[TileContext],
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm whose statistics pool across the tile axis when ``ctx`` given.

    ``x`` is [(T*B), C, h, w] with the tile index major.  Without a context
    this is a plain per-sample GroupNorm.
    """
    from .groupnorm import (apply_group_norm, group_norm,
                            group_norm_chanreduce, group_stats)

    if ctx is None:
        import os

        # MDU_GN=chanreduce: per-channel-moment formulation (A/B, TUNING.md)
        # MDU_GN=fold: no f32 activation temp (compile-OOM fix for huge
        # unrolled programs; groupnorm.py::group_norm_fold)
        gn_mode = os.environ.get("MDU_GN")
        if gn_mode == "chanreduce":
            return group_norm_chanreduce(x, num_groups, weight, bias, eps)
        if gn_mode == "fold":
            from .groupnorm import group_norm_fold

            return group_norm_fold(x, num_groups, weight, bias, eps)
        return group_norm(x, num_groups, weight, bias, eps)

    TB, C, h, w = x.shape
    T = ctx.num_tiles
    B = TB // T
    G = num_groups

    mask = ctx.mask_for(h, w)
    if mask is not None:
        # per-sample masked stats: expand masks [T,1,h,w] -> [(T*B),1,h,w]
        m = jnp.repeat(mask, B, axis=0).reshape(TB, 1, h, w)
        xf = x.astype(jnp.float32).reshape(TB, G, C // G, h, w)
        mm = m.reshape(TB, 1, 1, h, w)
        n = (jnp.sum(mm, axis=(2, 3, 4)) * (C // G)).reshape(TB, 1) * jnp.ones((1, G))
        s1 = jnp.sum(xf * mm, axis=(2, 3, 4))
        s2 = jnp.sum(xf * xf * mm, axis=(2, 3, 4))
        # all-zero masks (sharding pad tiles) contribute weight 0; keep their
        # per-tile moments finite so NaNs don't poison the pooled psum
        n_safe = jnp.maximum(n, 1.0)
        mean_t, meansq_t, n_t = s1 / n_safe, s2 / n_safe, n
    else:
        mean_t, meansq_t, n_t = group_stats(x, G)

    # pool over the tile axis (weighted by owned pixel counts)
    mean_t = mean_t.reshape(T, B, G)
    meansq_t = meansq_t.reshape(T, B, G)
    n_t = n_t.reshape(T, B, G)

    sn = jnp.sum(n_t, axis=0)
    s1 = jnp.sum(mean_t * n_t, axis=0)
    s2 = jnp.sum(meansq_t * n_t, axis=0)
    if ctx.axis_name is not None:
        sn = jax.lax.psum(sn, ctx.axis_name)
        s1 = jax.lax.psum(s1, ctx.axis_name)
        s2 = jax.lax.psum(s2, ctx.axis_name)
    mean = s1 / sn
    if ctx.reference_pooling:
        # ref tilevae.py:320-335: weighted average of per-tile biased vars
        var_t = jnp.maximum(meansq_t - mean_t * mean_t, 0.0)
        sv = jnp.sum(var_t * n_t, axis=0)
        if ctx.axis_name is not None:
            sv = jax.lax.psum(sv, ctx.axis_name)
        var = sv / sn
    else:
        var = jnp.maximum(s2 / sn - mean * mean, 0.0)

    # broadcast pooled stats back over tiles
    mean_b = jnp.broadcast_to(mean[None], (T, B, G)).reshape(TB, G)
    var_b = jnp.broadcast_to(var[None], (T, B, G)).reshape(TB, G)
    return apply_group_norm(x, G, mean_b, var_b, weight, bias, eps)
