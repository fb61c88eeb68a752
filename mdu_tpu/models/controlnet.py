"""Flax ControlNet (zero-conv control branch of the UNet).

The reference integrates the A1111 ControlNet *extension* by cropping its
hint tensors per tile (ref abstractdiffusion.py:454-544); this framework
owns the model: a copy of the UNet's down+mid path, a small conv encoder for
the pixel-space hint, and zero-initialized 1x1 convs producing residuals
that the UNet adds to its skip connections (diffusers ControlNetModel
semantics).

Hint tiling comes for free: the hint is a pixel-space cond leaf, and
tiling/conds.py slices canvas-shaped leaves per tile bbox — the generic form
of the reference's prepare/switch_controlnet_tensors.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Conv2D, Linear, silu, timestep_embedding
from .unet import (
    Downsample2D,
    ResBlock,
    Transformer2D,
    UNetConfig,
)


class ControlNetConditioningEmbedding(nn.Module):
    """Pixel hint [B,3,H,W] -> latent-res features (stride-8 conv stack)."""

    out_channels: int
    block_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hint):
        ch = self.block_channels
        h = silu(Conv2D(ch[0], dtype=self.dtype, name="conv_in")(hint))
        for i in range(len(ch) - 1):
            h = silu(Conv2D(ch[i], dtype=self.dtype, name=f"block_{2*i}")(h))
            h = silu(Conv2D(ch[i + 1], strides=(2, 2), dtype=self.dtype,
                            name=f"block_{2*i+1}")(h))
        return ZeroConv(self.out_channels, dtype=self.dtype, name="conv_out")(h)


class ZeroConv(nn.Module):
    """1x1 conv initialized to zero (the ControlNet gating trick)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[1]
        w = self.param("weight", nn.initializers.zeros, (self.features, C, 1, 1),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(x.astype(self.dtype), w.astype(self.dtype),
                                         (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn)
        return y + b.astype(self.dtype).reshape(1, -1, 1, 1)


class ControlNet(nn.Module):
    """Down+mid UNet copy emitting per-skip residuals.

    __call__(x, t, context, hint, added_cond) ->
        (down_residuals tuple, mid_residual), matching the UNet's
        ``residuals`` input.
    """

    cfg: UNetConfig
    conditioning_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context, hint, added_cond: Optional[dict] = None):
        cfg = self.cfg
        bc = cfg.block_out_channels
        ted = cfg.time_embed_dim

        temb = timestep_embedding(timesteps, bc[0])
        temb = Linear(ted, dtype=self.dtype, name="time_embed_1")(temb)
        temb = Linear(ted, dtype=self.dtype, name="time_embed_2")(silu(temb))
        if cfg.addition_embed_type == "text_time" and added_cond is not None:
            tids = added_cond["time_ids"].reshape(-1)
            tid_emb = timestep_embedding(tids, cfg.addition_time_embed_dim)
            tid_emb = tid_emb.reshape(x.shape[0], -1)
            add = jnp.concatenate([added_cond["text_embeds"], tid_emb], axis=-1)
            add = Linear(ted, dtype=self.dtype, name="add_embed_1")(add)
            add = Linear(ted, dtype=self.dtype, name="add_embed_2")(silu(add))
            temb = temb + add

        h = Conv2D(bc[0], dtype=self.dtype, name="conv_in")(x[:, :cfg.in_channels])
        h = h + ControlNetConditioningEmbedding(bc[0], dtype=self.dtype,
                                                name="cond_embedding")(hint)

        residuals = [ZeroConv(bc[0], dtype=self.dtype, name="zero_0")(h)]
        zc = 1
        for i, ch in enumerate(bc):
            for j in range(cfg.layers_per_block):
                h = ResBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                             name=f"down_{i}_res_{j}")(h, temb)
                if cfg.transformer_layers[i] > 0:
                    h = Transformer2D(cfg, ch, cfg.transformer_layers[i],
                                      dtype=self.dtype, name=f"down_{i}_attn_{j}")(h, context)
                residuals.append(ZeroConv(ch, dtype=self.dtype, name=f"zero_{zc}")(h))
                zc += 1
            if i != len(bc) - 1:
                h = Downsample2D(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
                residuals.append(ZeroConv(ch, dtype=self.dtype, name=f"zero_{zc}")(h))
                zc += 1

        mid_depth = cfg.transformer_layers[-1] if cfg.transformer_layers[-1] > 0 else 1
        h = ResBlock(bc[-1], cfg.norm_num_groups, dtype=self.dtype, name="mid_res_0")(h, temb)
        h = Transformer2D(cfg, bc[-1], mid_depth, dtype=self.dtype, name="mid_attn")(h, context)
        h = ResBlock(bc[-1], cfg.norm_num_groups, dtype=self.dtype, name="mid_res_1")(h, temb)
        mid = ZeroConv(bc[-1], dtype=self.dtype, name="zero_mid")(h)

        s = self.conditioning_scale
        return tuple(r * s for r in residuals), mid * s
