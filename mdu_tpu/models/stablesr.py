"""StableSR-style latent-image guidance adapter.

The reference integrates the StableSR *extension* by registering a
set_image_hooks callback and swapping ``stablesr_model.latent_image`` with a
per-tile slice before every tile batch and custom region
(ref tile_methods/abstractdiffusion.py:547-588).  This framework owns the
guidance model instead: a time-aware struct-condition encoder over the
low-resolution *latent* guidance image whose zero-conv-gated features are
added to the UNet's skip connections — the same ``residuals`` interface
ControlNet uses (models/unet.py), so guidance composes with tiling for free:

  * the guidance image rides the cond pytree under the ``'guidance'`` key as
    a latent-canvas-shaped leaf, and tiling/conds.py slices canvas-shaped
    leaves per tile bbox / per region — the generic restatement of the
    reference's switch_stablesr_tensors;
  * the pipeline feeds the sliced leaf through this model per tile batch.

Unlike ControlNet there is no pixel-space hint encoder (input is already
latent) and no text cross-attention (StableSR's struct encoder is
conv-only); the trunk is a conv/ResBlock pyramid mirroring the UNet's
down-path skip structure.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .controlnet import ZeroConv
from .layers import Conv2D, Linear, silu, timestep_embedding
from .unet import Downsample2D, ResBlock, UNetConfig


class StableSRGuidance(nn.Module):
    """Latent guidance [B,4,h,w] + t -> (down_residuals, mid_residual).

    Residual shapes match UNet2DCondition's skip list exactly (conv_in, then
    layers_per_block entries per level, a downsample entry between levels,
    and a mid residual), so the output plugs straight into
    ``unet.apply(..., residuals=...)``.
    """

    cfg: UNetConfig
    guidance_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, guidance: jnp.ndarray, timesteps: jnp.ndarray):
        cfg = self.cfg
        bc = cfg.block_out_channels
        ted = cfg.time_embed_dim

        temb = timestep_embedding(timesteps, bc[0])
        temb = Linear(ted, dtype=self.dtype, name="time_embed_1")(temb)
        temb = Linear(ted, dtype=self.dtype, name="time_embed_2")(silu(temb))

        h = Conv2D(bc[0], dtype=self.dtype, name="conv_in")(
            guidance.astype(self.dtype))
        residuals = [ZeroConv(bc[0], dtype=self.dtype, name="zero_0")(h)]
        zc = 1
        for i, ch in enumerate(bc):
            for j in range(cfg.layers_per_block):
                h = ResBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                             name=f"down_{i}_res_{j}")(h, temb)
                residuals.append(ZeroConv(ch, dtype=self.dtype, name=f"zero_{zc}")(h))
                zc += 1
            if i != len(bc) - 1:
                h = Downsample2D(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                residuals.append(ZeroConv(ch, dtype=self.dtype, name=f"zero_{zc}")(h))
                zc += 1

        h = ResBlock(bc[-1], cfg.norm_num_groups, dtype=self.dtype,
                     name="mid_res")(h, temb)
        mid = ZeroConv(bc[-1], dtype=self.dtype, name="zero_mid")(h)

        s = self.guidance_scale
        return tuple(r * s for r in residuals), mid * s


def combine_residuals(a: Optional[tuple], b: Optional[tuple]):
    """Merge two (down_residuals, mid) tuples (ControlNet + StableSR may both
    be active; residual streams add on the skip connections)."""
    if a is None:
        return b
    if b is None:
        return a
    down = tuple(x + y for x, y in zip(a[0], b[0]))
    return down, a[1] + b[1]
