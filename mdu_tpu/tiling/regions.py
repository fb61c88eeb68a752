"""Region-seeded noise composition for Regional Prompt Control.

Re-derivation of ref scripts/tilediffusion.py:486-529
(create_random_tensors_hijack): each enabled region with a fixed seed gets
its own gaussian noise patch; overlapping same-layer patches are averaged;
BACKGROUND patches replace the base noise, then FOREGROUND patches replace
both.  torch.manual_seed becomes a jax PRNG key per region.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..utils.bbox import BlendMode, RegionBBox


def resolve_seed(seed: int, key: jax.Array) -> int:
    """-1 means 'random': draw a fresh seed (ref get_fixed_seed)."""
    if seed is None or int(seed) == -1:
        return int(jax.random.randint(key, (), 0, 2**31 - 1))
    return int(seed)


def compose_region_noise(
    base_noise: jnp.ndarray,
    regions: Sequence[RegionBBox],
    resolved_seeds: Sequence[int],
) -> jnp.ndarray:
    """[B,C,h,w] base noise with per-region seeded patches pasted in."""
    if not regions:
        return base_noise
    B, C, H, W = base_noise.shape
    bg = jnp.zeros_like(base_noise)
    bg_cnt = jnp.zeros((1, 1, H, W), jnp.float32)
    fg = jnp.zeros_like(base_noise)
    fg_cnt = jnp.zeros((1, 1, H, W), jnp.float32)

    for r, seed in zip(regions, resolved_seeds):
        patch = jax.random.normal(jax.random.PRNGKey(seed), (1, C, r.h, r.w),
                                  base_noise.dtype)
        if r.blend_mode == BlendMode.BACKGROUND:
            bg = bg.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(patch)
            bg_cnt = bg_cnt.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(1.0)
        else:
            fg = fg.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(patch)
            fg_cnt = fg_cnt.at[:, :, r.y:r.y + r.h, r.x:r.x + r.w].add(1.0)

    bg = jnp.where(bg_cnt > 1, bg / bg_cnt, bg)
    fg = jnp.where(fg_cnt > 1, fg / fg_cnt, fg)
    out = jnp.where(bg_cnt > 0, bg, base_noise)
    out = jnp.where(fg_cnt > 0, fg, out)
    return out
