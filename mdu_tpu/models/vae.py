"""Flax AutoencoderKL (SD VAE) with tile-context-aware GroupNorm.

Architecture matches the SD-1.x/2.x/SDXL VAE (diffusers AutoencoderKL /
CompVis first_stage_model).  Every GroupNorm accepts a ``TileContext``: with
one, its statistics pool across lockstep-batched tiles — this is the whole
"Tiled VAE" mechanism (ref scripts/tilevae.py:107-195 task queue) expressed
as a single forward pass.

The mid-block attention runs per-tile over the halo-padded tile, like the
reference (tilevae.py:107-112 + tile_utils/attn.py), using the chunked SDPA
so the score matrix stays bounded.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import multi_head_attention
from ..ops.tile_context import TileContext
from .layers import Conv2D, GroupNorm, Linear, silu


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    attn_q_chunk: int = 4096

    @property
    def downscale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)


def tiny_vae_config() -> VAEConfig:
    """Small config for tests: downscale 8 like SD, 4-ch latent, thin."""
    return VAEConfig(block_out_channels=(8, 8, 16, 16), norm_num_groups=4)


class ResnetBlock(nn.Module):
    cfg: VAEConfig
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: Optional[TileContext] = None):
        g = self.cfg.norm_num_groups
        h = GroupNorm(g, dtype=self.dtype, name="norm1")(x, ctx)
        h = Conv2D(self.out_channels, dtype=self.dtype, name="conv1")(silu(h))
        h = GroupNorm(g, dtype=self.dtype, name="norm2")(h, ctx)
        h = Conv2D(self.out_channels, dtype=self.dtype, name="conv2")(silu(h))
        if x.shape[1] != self.out_channels:
            x = Conv2D(self.out_channels, kernel_size=(1, 1), padding=0,
                       dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: Optional[TileContext] = None):
        B, C, H, W = x.shape
        h = GroupNorm(self.cfg.norm_num_groups, dtype=self.dtype, name="group_norm")(x, ctx)
        tokens = h.reshape(B, C, H * W).transpose(0, 2, 1)
        q = Linear(C, dtype=self.dtype, name="to_q")(tokens)
        k = Linear(C, dtype=self.dtype, name="to_k")(tokens)
        v = Linear(C, dtype=self.dtype, name="to_v")(tokens)
        out = multi_head_attention(q, k, v, num_heads=1, q_chunk=self.cfg.attn_q_chunk)
        out = Linear(C, dtype=self.dtype, name="to_out")(out)
        return x + out.transpose(0, 2, 1).reshape(B, C, H, W)


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # asymmetric (0,1)x(0,1) pad + stride-2 conv, CompVis/diffusers VAE style
        return Conv2D(self.channels, strides=(2, 2), padding=((0, 1), (0, 1)),
                      dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)  # nearest 2x
        return Conv2D(self.channels, dtype=self.dtype, name="conv")(x)


class MidBlock(nn.Module):
    cfg: VAEConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx=None):
        x = ResnetBlock(self.cfg, self.channels, self.dtype, name="block_1")(x, ctx)
        x = AttnBlock(self.cfg, self.dtype, name="attn_1")(x, ctx)
        x = ResnetBlock(self.cfg, self.channels, self.dtype, name="block_2")(x, ctx)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx: Optional[TileContext] = None):
        cfg = self.cfg
        h = Conv2D(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(cfg, ch, self.dtype, name=f"down_{i}_block_{j}")(h, ctx)
            if i != len(cfg.block_out_channels) - 1:
                h = Downsample(ch, self.dtype, name=f"down_{i}_downsample")(h)
        h = MidBlock(cfg, cfg.block_out_channels[-1], self.dtype, name="mid")(h, ctx)
        h = GroupNorm(cfg.norm_num_groups, dtype=self.dtype, name="norm_out")(h, ctx)
        h = Conv2D(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(silu(h))
        return h                                  # moments [B, 2*latent, h, w]


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, ctx: Optional[TileContext] = None):
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))
        h = Conv2D(chans[0], dtype=self.dtype, name="conv_in")(z)
        h = MidBlock(cfg, chans[0], self.dtype, name="mid")(h, ctx)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(cfg, ch, self.dtype, name=f"up_{i}_block_{j}")(h, ctx)
            if i != len(chans) - 1:
                h = Upsample(ch, self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, dtype=self.dtype, name="norm_out")(h, ctx)
        h = Conv2D(cfg.out_channels, dtype=self.dtype, name="conv_out")(silu(h))
        return h


class AutoencoderKL(nn.Module):
    """Full VAE: encode -> diagonal gaussian moments; decode."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = Conv2D(2 * self.cfg.latent_channels, kernel_size=(1, 1),
                                 padding=0, dtype=self.dtype)
        self.post_quant_conv = Conv2D(self.cfg.latent_channels, kernel_size=(1, 1),
                                      padding=0, dtype=self.dtype)

    def encode_moments(self, x, ctx: Optional[TileContext] = None):
        return self.quant_conv(self.encoder(x, ctx))

    def decode(self, z, ctx: Optional[TileContext] = None):
        return self.decoder(self.post_quant_conv(z), ctx)

    def __call__(self, x, rng):
        moments = self.encode_moments(x)
        z = sample_from_moments(moments, rng)
        return self.decode(z)


def sample_from_moments(moments: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Diagonal gaussian sample from [B, 2C, H, W] (mean, logvar) moments."""
    mean, logvar = jnp.split(moments, 2, axis=1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)
