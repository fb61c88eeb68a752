"""Flax AutoencoderKL (SD VAE) with tile-context-aware GroupNorm.

Architecture matches the SD-1.x/2.x/SDXL VAE (diffusers AutoencoderKL /
CompVis first_stage_model).  Every GroupNorm accepts a ``TileContext``: with
one, its statistics pool across lockstep-batched tiles — this is the whole
"Tiled VAE" mechanism (ref scripts/tilevae.py:107-195 task queue) expressed
as a single forward pass.

Submodules are declared in ``setup`` (not ``nn.compact``) so the streaming
executor (tiling/streaming_vae.py) can address every op individually for the
fixed-HBM 8K path, while ``__call__`` remains the single jitted program for
the lockstep path.  Parameter names are identical either way.

The mid-block attention runs per-tile over the halo-padded tile, like the
reference (tilevae.py:107-112 + tile_utils/attn.py), using the chunked SDPA
so the score matrix stays bounded.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

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
    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        g = self.cfg.norm_num_groups
        self.norm1 = GroupNorm(g, dtype=self.dtype)
        self.conv1 = Conv2D(self.out_channels, dtype=self.dtype)
        self.norm2 = GroupNorm(g, dtype=self.dtype)
        self.conv2 = Conv2D(self.out_channels, dtype=self.dtype)
        if self.in_channels != self.out_channels:
            self.conv_shortcut = Conv2D(self.out_channels, kernel_size=(1, 1),
                                        padding=0, dtype=self.dtype)

    def shortcut(self, x):
        if self.in_channels != self.out_channels:
            return self.conv_shortcut(x)
        return x

    def __call__(self, x, ctx: Optional[TileContext] = None):
        h = self.norm1(x, ctx)
        h = self.conv1(silu(h))
        h = self.norm2(h, ctx)
        h = self.conv2(silu(h))
        return self.shortcut(x) + h


class AttnBlock(nn.Module):
    """Single-head self-attention over spatial tokens (VAE mid block)."""

    cfg: VAEConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.group_norm = GroupNorm(self.cfg.norm_num_groups, dtype=self.dtype)
        self.to_q = Linear(self.channels, dtype=self.dtype)
        self.to_k = Linear(self.channels, dtype=self.dtype)
        self.to_v = Linear(self.channels, dtype=self.dtype)
        self.to_out = Linear(self.channels, dtype=self.dtype)

    def attend(self, h):
        """Attention over an already-normalized input (no residual)."""
        B, C, H, W = h.shape
        tokens = h.reshape(B, C, H * W).transpose(0, 2, 1)
        q = self.to_q(tokens)
        k = self.to_k(tokens)
        v = self.to_v(tokens)
        out = multi_head_attention(q, k, v, num_heads=1,
                                   q_chunk=self.cfg.attn_q_chunk)
        out = self.to_out(out)
        return out.transpose(0, 2, 1).reshape(B, C, H, W)

    def __call__(self, x, ctx: Optional[TileContext] = None):
        return x + self.attend(self.group_norm(x, ctx))


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # asymmetric (0,1)x(0,1) pad + stride-2 conv, CompVis/diffusers VAE style
        self.conv = Conv2D(self.channels, strides=(2, 2), padding=((0, 1), (0, 1)),
                           dtype=self.dtype)

    def __call__(self, x):
        return self.conv(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv = Conv2D(self.channels, dtype=self.dtype)

    def __call__(self, x):
        return self.conv(jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3))


class MidBlock(nn.Module):
    cfg: VAEConfig
    channels: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.block_1 = ResnetBlock(self.cfg, self.channels, self.channels, dtype=self.dtype)
        self.attn_1 = AttnBlock(self.cfg, self.channels, dtype=self.dtype)
        self.block_2 = ResnetBlock(self.cfg, self.channels, self.channels, dtype=self.dtype)

    def __call__(self, x, ctx=None):
        x = self.block_1(x, ctx)
        x = self.attn_1(x, ctx)
        x = self.block_2(x, ctx)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.conv_in = Conv2D(cfg.block_out_channels[0], dtype=self.dtype)
        blocks = {}
        in_ch = cfg.block_out_channels[0]
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                blocks[f"down_{i}_block_{j}"] = ResnetBlock(
                    cfg, in_ch, ch, dtype=self.dtype, name=f"down_{i}_block_{j}")
                in_ch = ch
            if i != len(cfg.block_out_channels) - 1:
                blocks[f"down_{i}_downsample"] = Downsample(
                    ch, dtype=self.dtype, name=f"down_{i}_downsample")
        self._blocks = blocks
        self.mid = MidBlock(cfg, cfg.block_out_channels[-1], dtype=self.dtype)
        self.norm_out = GroupNorm(cfg.norm_num_groups, dtype=self.dtype)
        self.conv_out = Conv2D(2 * cfg.latent_channels, dtype=self.dtype)

    def __call__(self, x, ctx: Optional[TileContext] = None):
        cfg = self.cfg
        h = self.conv_in(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = self._blocks[f"down_{i}_block_{j}"](h, ctx)
            if i != len(cfg.block_out_channels) - 1:
                h = self._blocks[f"down_{i}_downsample"](h)
        h = self.mid(h, ctx)
        h = self.norm_out(h, ctx)
        h = self.conv_out(silu(h))
        return h                                  # moments [B, 2*latent, h, w]


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))
        self.conv_in = Conv2D(chans[0], dtype=self.dtype)
        self.mid = MidBlock(cfg, chans[0], dtype=self.dtype)
        blocks = {}
        in_ch = chans[0]
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                blocks[f"up_{i}_block_{j}"] = ResnetBlock(
                    cfg, in_ch, ch, dtype=self.dtype, name=f"up_{i}_block_{j}")
                in_ch = ch
            if i != len(chans) - 1:
                blocks[f"up_{i}_upsample"] = Upsample(
                    ch, dtype=self.dtype, name=f"up_{i}_upsample")
        self._blocks = blocks
        self.norm_out = GroupNorm(cfg.norm_num_groups, dtype=self.dtype)
        self.conv_out = Conv2D(cfg.out_channels, dtype=self.dtype)

    def __call__(self, z, ctx: Optional[TileContext] = None):
        cfg = self.cfg
        chans = list(reversed(cfg.block_out_channels))
        h = self.conv_in(z)
        h = self.mid(h, ctx)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = self._blocks[f"up_{i}_block_{j}"](h, ctx)
            if i != len(chans) - 1:
                h = self._blocks[f"up_{i}_upsample"](h)
        h = self.norm_out(h, ctx)
        h = self.conv_out(silu(h))
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
