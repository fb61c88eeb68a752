"""Flax UNet2DCondition — the SD denoiser family (SD1.x / SD2.x / SDXL).

The reference borrows A1111's UNet (SURVEY.md L0); here it is owned.  One
parameterized module covers the family:

  * SD1.5 : 4 levels (320,640,1280,1280), 8 heads, ctx 768, conv projections
  * SD2.x : head_dim 64, ctx 1024, linear projections
  * SDXL  : 3 levels (320,640,1280), transformer depth (1,2,10), ctx 2048,
            'text_time' addition embedding (pooled text + size micro-conds)

Tiles of a tiled-diffusion step enter as independent batch entries, so all
norms are per-sample — no cross-tile pooling in the UNet (matches the
reference, which runs the stock UNet per tile batch).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from .layers import Conv2D, GroupNorm, LayerNorm, Linear, silu, timestep_embedding


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_heads: Optional[int] = 8            # SD1.5: fixed head count
    head_dim: Optional[int] = None          # SD2/SDXL: fixed head dim (64)
    transformer_layers: Tuple[int, ...] = (1, 1, 1, 0)   # 0 = no attn block
    use_linear_projection: bool = False
    addition_embed_type: Optional[str] = None            # 'text_time' for SDXL
    addition_time_embed_dim: int = 256
    addition_pooled_dim: int = 1280
    num_time_ids: int = 6
    norm_num_groups: int = 32
    # unclip-class image conditioning (SD2.1-unCLIP): a [B, adm_in_channels]
    # CLIP image embedding enters as added_cond['adm'] and is MLP-projected
    # into the time embedding — the 'c_adm' icond of the reference's cond
    # contract (ref abstractdiffusion.py:133-141: conditioning_key
    # 'crossattn-adm'; LDM num_classes='sequential' label_emb).  None = off.
    adm_in_channels: Optional[int] = None

    def heads_for(self, channels: int) -> int:
        if self.head_dim is not None:
            return channels // self.head_dim
        return self.num_heads

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def sd15_unet_config() -> UNetConfig:
    return UNetConfig()


def sd21_unet_config() -> UNetConfig:
    return UNetConfig(cross_attention_dim=1024, num_heads=None, head_dim=64,
                      use_linear_projection=True)


def sd21_unclip_unet_config(variant: str = "l") -> UNetConfig:
    """SD2.1-unCLIP: the SD2.1 backbone plus a CLIP image-embedding 'adm'
    conditioning head ('l' = ViT-L image embed stack, adm 1536; 'h' = ViT-H,
    adm 2048).  Ref abstractdiffusion.py:133-141 routes this as the c_adm
    icond."""
    return UNetConfig(cross_attention_dim=1024, num_heads=None, head_dim=64,
                      use_linear_projection=True,
                      adm_in_channels=1536 if variant == "l" else 2048)


def sdxl_unet_config() -> UNetConfig:
    return UNetConfig(
        block_out_channels=(320, 640, 1280), cross_attention_dim=2048,
        num_heads=None, head_dim=64, transformer_layers=(0, 2, 10),
        use_linear_projection=True, addition_embed_type="text_time")


def default_unet_layout() -> str:
    """Activation layout for newly-built UNets.

    ``MDU_UNET_LAYOUT=NHWC`` selects the channels-last internal schedule
    (TPU-native; no per-layer activation transposes — the round-2 A/B showed
    transposes absorbing the fused-conv kernel's win, docs/TUNING.md).  The
    parameter tree is identical in either layout, so the flag is safe to flip
    on any loaded checkpoint.  Default stays NCHW until the on-chip A/B says
    otherwise.
    """
    import os

    v = os.environ.get("MDU_UNET_LAYOUT", "NCHW").upper()
    if v not in ("NCHW", "NHWC"):
        raise ValueError(f"MDU_UNET_LAYOUT must be NCHW or NHWC, got {v!r}")
    return v


def tiny_unet_config() -> UNetConfig:
    """Small SD1.5-shaped config for tests (full depth, thin width)."""
    return UNetConfig(block_out_channels=(8, 16, 16, 16), cross_attention_dim=16,
                      num_heads=2, transformer_layers=(1, 1, 1, 0), norm_num_groups=4)


def tiny_sdxl_unet_config() -> UNetConfig:
    return UNetConfig(block_out_channels=(8, 16, 16), cross_attention_dim=16,
                      num_heads=None, head_dim=8, transformer_layers=(0, 1, 2),
                      use_linear_projection=True, addition_embed_type="text_time",
                      addition_time_embed_dim=8, addition_pooled_dim=16, norm_num_groups=4)


class CrossAttention(nn.Module):
    query_dim: int
    heads: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        q = Linear(self.query_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Linear(self.query_dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Linear(self.query_dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = multi_head_attention(q, k, v, self.heads)
        return Linear(self.query_dim, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = Linear(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate)
        return Linear(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.dim, self.heads, dtype=self.dtype, name="attn1")(
            LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.dim, self.heads, self.context_dim, dtype=self.dtype,
                               name="attn2")(LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        x = x + FeedForwardGEGLU(self.dim, dtype=self.dtype, name="ff")(
            LayerNorm(dtype=self.dtype, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    cfg: UNetConfig
    channels: int
    depth: int
    dtype: jnp.dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x, context):
        nhwc = self.layout == "NHWC"
        if nhwc:
            B, H, W, C = x.shape
        else:
            B, C, H, W = x.shape
        heads = self.cfg.heads_for(C)
        h = GroupNorm(self.cfg.norm_num_groups, eps=1e-6, dtype=self.dtype,
                      layout=self.layout, name="norm")(x)
        if self.cfg.use_linear_projection:
            # NHWC: tokens are a pure reshape; NCHW pays a transpose
            h = h.reshape(B, H * W, C) if nhwc else \
                h.reshape(B, C, H * W).transpose(0, 2, 1)
            h = Linear(C, dtype=self.dtype, name="proj_in")(h)
        else:
            h = Conv2D(C, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                       layout=self.layout, name="proj_in")(h)
            h = h.reshape(B, H * W, C) if nhwc else \
                h.reshape(B, C, H * W).transpose(0, 2, 1)
        for d in range(self.depth):
            h = BasicTransformerBlock(C, heads, self.cfg.cross_attention_dim,
                                      dtype=self.dtype, name=f"block_{d}")(h, context)
        if self.cfg.use_linear_projection:
            h = Linear(C, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(B, H, W, C) if nhwc else \
                h.transpose(0, 2, 1).reshape(B, C, H, W)
        else:
            h = h.reshape(B, H, W, C) if nhwc else \
                h.transpose(0, 2, 1).reshape(B, C, H, W)
            h = Conv2D(C, kernel_size=(1, 1), padding=0, dtype=self.dtype,
                       layout=self.layout, name="proj_out")(h)
        return x + h


class ResBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x, temb):
        from .layers import _use_fused_conv

        nhwc = self.layout == "NHWC"
        ch_axis = 3 if nhwc else 1
        norm1 = GroupNorm(self.groups, eps=1e-5, dtype=self.dtype,
                          layout=self.layout, name="norm1")
        conv1 = Conv2D(self.out_channels, dtype=self.dtype,
                       layout=self.layout, name="conv1")
        norm2 = GroupNorm(self.groups, eps=1e-5, dtype=self.dtype,
                          layout=self.layout, name="norm2")
        conv2 = Conv2D(self.out_channels, dtype=self.dtype,
                       layout=self.layout, name="conv2")
        t = Linear(self.out_channels, dtype=self.dtype, name="time_emb_proj")(silu(temb))
        t = t[:, None, None, :] if nhwc else t[:, :, None, None]
        if _use_fused_conv():
            # normalize+silu fused INTO the conv kernel (one HBM pass)
            a1, b1 = norm1(x, affine_only=True)
            h = conv1(x, scale=a1, shift=b1)
            h = h + t
            a2, b2 = norm2(h, affine_only=True)
            h = conv2(h, scale=a2, shift=b2)
        else:
            h = conv1(silu(norm1(x)))
            h = h + t
            h = conv2(silu(norm2(h)))
        if x.shape[ch_axis] != self.out_channels:
            x = Conv2D(self.out_channels, kernel_size=(1, 1), padding=0,
                       dtype=self.dtype, layout=self.layout,
                       name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x):
        return Conv2D(self.channels, strides=(2, 2), padding=1, dtype=self.dtype,
                      layout=self.layout, name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x, out_size=None):
        sp = (1, 2) if self.layout == "NHWC" else (2, 3)
        if out_size is not None and \
                tuple(out_size) != (2 * x.shape[sp[0]], 2 * x.shape[sp[1]]):
            # latents not divisible by 2^levels: nearest-resize straight to
            # the skip's spatial size, as diffusers' Upsample2D does with its
            # forwarded ``upsample_size`` (the torch stack the reference runs
            # on handles e.g. a 12-row latent this way)
            shape = list(x.shape)
            shape[sp[0]], shape[sp[1]] = int(out_size[0]), int(out_size[1])
            x = jax.image.resize(x, shape, method="nearest")
        else:
            x = jnp.repeat(jnp.repeat(x, 2, axis=sp[0]), 2, axis=sp[1])
        return Conv2D(self.channels, dtype=self.dtype, layout=self.layout,
                      name="conv")(x)


class UNet2DCondition(nn.Module):
    """``layout='NHWC'`` runs the network channels-last internally (one
    transpose at entry/exit; convs, GroupNorm, and the token reshape are
    then native — no per-layer activation transposes).  The public
    contract and the parameter tree are identical in either layout."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x, timesteps, context, added_cond: Optional[dict] = None,
                 residuals: Optional[tuple] = None,
                 cache: Optional[jnp.ndarray] = None,
                 cache_mode: Optional[str] = None,
                 cache_branch: int = 1):
        """x [B,C,H,W]; timesteps [B]; context [B,L,D] text embeddings;
        added_cond for SDXL: {'text_embeds': [B,1280], 'time_ids': [B,6]};
        residuals: optional ControlNet outputs (down_residuals, mid_residual)
        added to the skip connections and mid state (diffusers semantics).

        Step-level feature caching (DeepCache, arXiv:2312.00858 — adjacent
        denoising steps share deep UNet features; the reference has no
        analogue, this is a TPU-friendly acceleration: the branch is a
        static `lax.cond` between two fixed subgraphs):

        * ``cache_mode='write'``: full forward; returns ``(out, feature)``
          where ``feature`` is the activation entering the shallowest
          ``cache_branch`` up-levels (right after ``up_{L-b-1}_upsample``).
        * ``cache_mode='read'``: recompute only the shallow path — conv_in,
          down levels ``0..b-1`` (minus the deepest of their downsamples),
          then resume from ``cache`` through the last ``b`` up-levels;
          returns ``out`` only.  With the cache written at the same
          ``(x, t, context)`` this is bitwise identical to the full pass.
        """
        cfg = self.cfg
        nhwc = self.layout == "NHWC"
        ch_axis = 3 if nhwc else 1
        bc = cfg.block_out_channels
        ted = cfg.time_embed_dim
        L = len(bc)
        read = cache_mode == "read"
        if cache_mode is not None and not (1 <= cache_branch <= L - 1):
            raise ValueError(f"cache_branch must be in [1, {L - 1}]")

        temb = timestep_embedding(timesteps, bc[0])
        temb = Linear(ted, dtype=self.dtype, name="time_embed_1")(temb)
        temb = Linear(ted, dtype=self.dtype, name="time_embed_2")(silu(temb))

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs added_cond text_embeds/time_ids"
            tids = added_cond["time_ids"].reshape(-1)
            tid_emb = timestep_embedding(tids, cfg.addition_time_embed_dim)
            tid_emb = tid_emb.reshape(x.shape[0], -1)
            add = jnp.concatenate([added_cond["text_embeds"], tid_emb], axis=-1)
            add = Linear(ted, dtype=self.dtype, name="add_embed_1")(add)
            add = Linear(ted, dtype=self.dtype, name="add_embed_2")(silu(add))
            temb = temb + add

        if cfg.adm_in_channels is not None:
            # unclip image conditioning: LDM's sequential label_emb MLP on
            # the c_adm vector, summed into the time embedding
            assert added_cond is not None and "adm" in added_cond, \
                "unclip-class model needs added_cond['adm'] (cond['adm'])"
            lab = added_cond["adm"].astype(temb.dtype)
            lab = Linear(ted, dtype=self.dtype, name="label_embed_1")(lab)
            lab = Linear(ted, dtype=self.dtype, name="label_embed_2")(silu(lab))
            temb = temb + lab

        if nhwc:
            x = x.transpose(0, 2, 3, 1)
        h = Conv2D(bc[0], dtype=self.dtype, layout=self.layout, name="conv_in")(x)
        skips = [h]
        down_levels = range(cache_branch) if read else range(L)
        for i in down_levels:
            ch = bc[i]
            for j in range(cfg.layers_per_block):
                h = ResBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                             layout=self.layout, name=f"down_{i}_res_{j}")(h, temb)
                if cfg.transformer_layers[i] > 0:
                    h = Transformer2D(cfg, ch, cfg.transformer_layers[i],
                                      dtype=self.dtype, layout=self.layout,
                                      name=f"down_{i}_attn_{j}")(h, context)
                skips.append(h)
            # on read, the deepest shallow level's downsample only feeds the
            # (skipped) deep path — downsample skips d_0..d_{b-2} are the
            # ones the last b up-levels consume
            if i != L - 1 and not (read and i == cache_branch - 1):
                h = Downsample2D(ch, dtype=self.dtype, layout=self.layout,
                                 name=f"down_{i}_downsample")(h)
                skips.append(h)

        if residuals is not None:
            # ControlNet residuals arrive NCHW (the adapter keeps the
            # reference layout); rotate them once at the add sites.  On a
            # cached step only the shallow skips exist — zip truncates to
            # exactly the residuals those skips would have received.
            down_res, mid_res = residuals
            if nhwc:
                down_res = [r.transpose(0, 2, 3, 1) for r in down_res]
                mid_res = mid_res.transpose(0, 2, 3, 1) if not read else mid_res
            skips = [s + r for s, r in zip(skips, down_res)]

        if not read:
            mid_depth = cfg.transformer_layers[-1] if cfg.transformer_layers[-1] > 0 else 1
            h = ResBlock(bc[-1], cfg.norm_num_groups, dtype=self.dtype,
                         layout=self.layout, name="mid_res_0")(h, temb)
            h = Transformer2D(cfg, bc[-1], mid_depth, dtype=self.dtype,
                              layout=self.layout, name="mid_attn")(h, context)
            h = ResBlock(bc[-1], cfg.norm_num_groups, dtype=self.dtype,
                         layout=self.layout, name="mid_res_1")(h, temb)
            if residuals is not None:
                h = h + mid_res
        else:
            h = cache

        feature = None
        up_start = L - cache_branch if read else 0
        for i in range(up_start, L):
            ch = bc[L - 1 - i]
            level = L - 1 - i
            for j in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=ch_axis)
                h = ResBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                             layout=self.layout, name=f"up_{i}_res_{j}")(h, temb)
                if cfg.transformer_layers[level] > 0:
                    h = Transformer2D(cfg, ch, cfg.transformer_layers[level],
                                      dtype=self.dtype, layout=self.layout,
                                      name=f"up_{i}_attn_{j}")(h, context)
            if i != L - 1:
                # snap to the next skip's spatial size (diffusers forwards
                # ``upsample_size`` the same way) so non-2^L-divisible
                # latents round-trip the U
                nsp = (1, 2) if ch_axis == 3 else (2, 3)
                nxt = skips[-1]
                h = Upsample2D(ch, dtype=self.dtype, layout=self.layout,
                               name=f"up_{i}_upsample")(
                    h, (nxt.shape[nsp[0]], nxt.shape[nsp[1]]))
                if cache_mode == "write" and i == L - cache_branch - 1:
                    feature = h

        h = GroupNorm(cfg.norm_num_groups, eps=1e-5, dtype=self.dtype,
                      layout=self.layout, name="norm_out")(h)
        h = Conv2D(cfg.out_channels, dtype=self.dtype, layout=self.layout,
                   name="conv_out")(silu(h))
        out = h.transpose(0, 3, 1, 2) if nhwc else h
        if cache_mode == "write":
            return out, feature
        return out
