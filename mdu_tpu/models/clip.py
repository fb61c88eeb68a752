"""Flax CLIP text encoder (SD1.x CLIP-L, SD2.x OpenCLIP-H, SDXL dual).

The reference gets text conditioning from A1111's prompt pipeline
(ref tile_utils/utils.py:116-148 Condition helpers); here the encoder is
owned.  One module covers the family via config:

  * SD1.5 CLIP-L/14 : 768 wide, 12 layers, quick_gelu, final-layer states
  * SD2.1 OpenCLIP-H: 1024 wide, 23-of-24 layers (penultimate), gelu
  * SDXL            : CLIP-L (penultimate) + OpenCLIP-bigG 1280 (penultimate,
                      with text_projection for the pooled embedding)
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import LayerNorm, Linear


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    hidden_act: str = "quick_gelu"      # quick_gelu (CLIP-L) | gelu (OpenCLIP)
    projection_dim: Optional[int] = None  # OpenCLIP text_projection (SDXL enc 2)
    clip_skip: int = 1                  # 1 = final layer, 2 = penultimate, ...
    # A1111 clip-skip LayerNorms the earlier layer's states (SD1/SD2); SDXL's
    # sgm/diffusers conditioners take hidden_states[-2] RAW — no final LN
    ln_penultimate: bool = True


def clip_l_config() -> CLIPTextConfig:
    return CLIPTextConfig()


def open_clip_h_config() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=1024, num_layers=23, num_heads=16,
                          hidden_act="gelu", clip_skip=2)


def open_clip_bigg_config() -> CLIPTextConfig:
    return CLIPTextConfig(hidden_size=1280, num_layers=32, num_heads=20,
                          hidden_act="gelu", projection_dim=1280, clip_skip=2,
                          ln_penultimate=False)


def tiny_clip_config() -> CLIPTextConfig:
    return CLIPTextConfig(vocab_size=1000, hidden_size=16, num_layers=2,
                          num_heads=2, max_length=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.cfg
        h = LayerNorm(dtype=self.dtype, name="ln1")(x)
        B, L, D = h.shape
        Hn, Dh = c.num_heads, c.hidden_size // c.num_heads
        q = Linear(D, dtype=self.dtype, name="q")(h).reshape(B, L, Hn, Dh).transpose(0, 2, 1, 3)
        k = Linear(D, dtype=self.dtype, name="k")(h).reshape(B, L, Hn, Dh).transpose(0, 2, 1, 3)
        v = Linear(D, dtype=self.dtype, name="v")(h).reshape(B, L, Hn, Dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (Dh**-0.5)
        probs = jax.nn.softmax(scores + causal_bias, axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", probs, v).transpose(0, 2, 1, 3).reshape(B, L, D)
        x = x + Linear(D, dtype=self.dtype, name="out")(att)
        h = LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = Linear(4 * D, dtype=self.dtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        x = x + Linear(D, dtype=self.dtype, name="fc2")(h)
        return x


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """input_ids [B, L] -> (hidden_states [B, L, D], pooled [B, D or proj]).

        ``hidden_states`` honors cfg.clip_skip (1=final LN output, 2=
        penultimate layer, pre-final-LN — A1111 'CLIP skip' semantics: the
        skipped layers' output is still LayerNormed).
        """
        c = self.cfg
        B, L = input_ids.shape
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("position_embedding", nn.initializers.normal(0.01),
                         (c.max_length, c.hidden_size), jnp.float32)
        x = tok[input_ids].astype(self.dtype) + pos[None, :L].astype(self.dtype)

        mask = jnp.triu(jnp.full((L, L), -jnp.inf, dtype=jnp.float32), k=1)
        causal_bias = mask[None, None]

        keep = c.num_layers - (c.clip_skip - 1)
        hidden = None
        for i in range(c.num_layers):
            x = CLIPLayer(c, dtype=self.dtype, name=f"layer_{i}")(x, causal_bias)
            if i == keep - 1:
                hidden = x
        ln_final = LayerNorm(dtype=self.dtype, name="ln_final")
        final = ln_final(x)
        # A1111 'CLIP skip' applies the final LayerNorm to the earlier layer;
        # SDXL conditioners (ln_penultimate=False) use the raw states
        if c.clip_skip > 1:
            out_hidden = ln_final(hidden) if c.ln_penultimate else hidden
        else:
            out_hidden = final

        # pooled state: position of the highest token id (the EOT token)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = final[jnp.arange(B), eot]
        if c.projection_dim is not None:
            pooled = Linear(c.projection_dim, use_bias=False, dtype=self.dtype,
                            name="text_projection")(pooled)
        return out_hidden, pooled
