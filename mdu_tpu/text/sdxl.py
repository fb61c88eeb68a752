"""SDXL conditioning: dual text encoders + size micro-conditioning.

The reference plumbs SDXL's cond dict through tcond/vcond accessors
(ref abstractdiffusion.py:149-160, tile_utils/typing.py:39-44); here the
full construction is owned:

  crossattn = concat(CLIP-L penultimate, OpenCLIP-bigG penultimate)  [B,77,2048]
  vector    = bigG pooled (projected)                                 [B,1280]
  time_ids  = (orig_h, orig_w, crop_top, crop_left, target_h, target_w)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from .conditioning import TextConditioner


class SDXLConditioner:
    """Builds SDXL cond pytrees from two TextConditioners."""

    def __init__(self, te1: TextConditioner, te2: TextConditioner):
        self.te1 = te1        # CLIP-L (clip_skip=2)
        self.te2 = te2        # OpenCLIP-bigG (projection_dim=1280)

    def cond(
        self,
        prompt: str,
        width: int,
        height: int,
        original_size: Optional[Tuple[int, int]] = None,
        crops_coords_top_left: Tuple[int, int] = (0, 0),
        steps: Optional[int] = None,
    ):
        z1, _ = self.te1.encode([prompt])
        z2, pooled2 = self.te2.encode([prompt])
        # chunk counts may differ when prompts overflow; pad to the longer
        L = max(z1.shape[1], z2.shape[1])

        def pad(z):
            if z.shape[1] < L:
                reps = L // z.shape[1]
                z = jnp.concatenate([z] + [z[:, -z.shape[1]:]] * (reps - 1), axis=1)
            return z[:, :L]

        crossattn = jnp.concatenate([pad(z1), pad(z2)], axis=-1)
        oh, ow = original_size or (height, width)
        ct, cl = crops_coords_top_left
        time_ids = jnp.asarray([[oh, ow, ct, cl, height, width]], jnp.float32)
        return {"crossattn": crossattn, "vector": pooled2, "time_ids": time_ids}

    def pair(self, prompt: str, neg_prompt: str, width: int, height: int,
             steps: Optional[int] = None, **kw):
        return (self.cond(prompt, width, height, steps=steps, **kw),
                self.cond(neg_prompt, width, height, steps=steps, **kw))
