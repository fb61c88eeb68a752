"""Shared NN building blocks (flax.linen), torch-layout parameters.

Parameters use torch naming/layout — conv kernels OIHW named ``weight``,
linears ``[out, in]`` — so loading diffusers/CompVis safetensors checkpoints
is a pure name-mapping with no transposes (see models/loader.py).

All modules take logical NCHW activations; XLA's TPU layout assignment
chooses physical layouts, so this costs nothing while keeping parity with
the reference's tensor semantics.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.tile_context import TileContext, tile_group_norm

Dtype = Any


def _use_fused_group_norm() -> bool:
    """Opt-in Pallas fused GroupNorm (set MDU_FUSED_GN=1; TPU only).

    Off by default until A/B'd on-chip — ROADMAP.md item 1."""
    import os

    if os.environ.get("MDU_FUSED_GN") != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _use_fused_conv() -> bool:
    """Opt-in Pallas fused norm+silu+conv3x3 (MDU_FUSED_CONV=1 on TPU;
    =interp runs the kernel in interpret mode for CPU CI).

    Measured on v5e (scripts /tmp conv bench, docs/TUNING.md): the fused
    kernel beats XLA's normalize+silu+conv chain at every SD UNet shape
    (2.09 vs 2.66 ms at [10,64,96,320], 3.48 vs 3.68 at [16,96,96,320],
    2.02 vs 2.24 at [10,32,48,640])."""
    import os

    v = os.environ.get("MDU_FUSED_CONV")
    if v == "interp":
        return True
    if v != "1":
        return False
    try:
        import jax

        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _fused_conv_interpret() -> bool:
    import os

    return os.environ.get("MDU_FUSED_CONV") == "interp"


def _conv_mm_mode() -> Optional[str]:
    """Opt-in conv3x3-as-matmuls (MDU_CONV_MM=9mm | im2col).

    Rewrites every 'same' stride-1 3x3 conv as MXU matmuls
    (ops/conv_mm.py) — the candidate fix for the conv throughput floor
    (docs/TUNING.md: conv 47-60 TF/s vs matmul 144-154 TF/s on v5e).
    Off until the on-chip pipeline A/B shows a win; works on every
    backend (pure jnp), so CPU tests exercise the real code path."""
    import os

    v = os.environ.get("MDU_CONV_MM")
    return v if v in ("9mm", "im2col") else None


def _conv_kernel_init(key, shape, dtype):
    # He-uniform over fan_in, matching torch's default Conv2d init closely
    fan_in = shape[1] * shape[2] * shape[3]
    bound = (1.0 / fan_in) ** 0.5 * (3.0 ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _linear_kernel_init(key, shape, dtype):
    fan_in = shape[1]
    bound = (1.0 / fan_in) ** 0.5 * (3.0 ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv2D(nn.Module):
    """2-D conv with an OIHW ``weight`` param (torch layout).

    ``layout`` selects the *activation* layout: 'NCHW' (default, the
    reference's tensor semantics) or 'NHWC' (TPU-native channels-last —
    convs and the fused GN+SiLU+conv Pallas kernel run without per-call
    activation transposes; the round-2 A/B showed those transposes absorb
    the kernel's isolated win, docs/TUNING.md).  Parameters are identical
    in either layout, so checkpoints load unchanged."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, int, Sequence[Tuple[int, int]]] = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: Optional[jnp.ndarray] = None,
                 shift: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``scale``/``shift`` ([B, C_in] f32, a folded GroupNorm affine)
        request the fused conv(silu(x*scale + shift)) contract — one Pallas
        kernel on TPU, an XLA elementwise chain elsewhere."""
        nhwc = self.layout == "NHWC"
        in_c = x.shape[3] if nhwc else x.shape[1]
        H, W = (x.shape[1], x.shape[2]) if nhwc else (x.shape[2], x.shape[3])
        kh, kw = self.kernel_size
        w = self.param("weight", _conv_kernel_init, (self.features, in_c, kh, kw), jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)

        fused_ok = (scale is not None and (kh, kw) == (3, 3)
                    and self.strides == (1, 1) and self.padding == 1
                    and H * W >= 64                    # tiny spatial: XLA wins
                    and (nhwc or max(in_c, self.features) <= 640)
                    and _use_fused_conv())
        if fused_ok:
            from ..ops.pallas.conv3x3 import conv3x3_plan_fits

            fused_ok = conv3x3_plan_fits(H, W, in_c, self.features)
        if fused_ok:
            from ..ops.pallas.conv3x3 import fused_conv3x3

            xh = (x if nhwc else x.transpose(0, 2, 3, 1)).astype(self.dtype)
            wh = w.astype(self.dtype).transpose(2, 3, 1, 0)       # HWIO
            y = fused_conv3x3(xh, wh, scale, shift, fuse_act=True,
                              interpret=_fused_conv_interpret())
            if not nhwc:
                y = y.transpose(0, 3, 1, 2)
            if self.use_bias:
                bb = b.astype(self.dtype)
                y = y + (bb.reshape(1, 1, 1, -1) if nhwc else bb.reshape(1, -1, 1, 1))
            return y

        if scale is not None:
            sc = (scale[:, None, None, :], shift[:, None, None, :]) if nhwc \
                else (scale[:, :, None, None], shift[:, :, None, None])
            xf = x.astype(jnp.float32) * sc[0] + sc[1]
            x = (xf * jax.nn.sigmoid(xf)).astype(self.dtype)
        mm = _conv_mm_mode()
        if (mm and (kh, kw) == (3, 3) and self.strides == (1, 1)
                and self.padding == 1):
            from ..ops.conv_mm import conv3x3_mm

            y = conv3x3_mm(x.astype(self.dtype), w.astype(self.dtype),
                           mode=mm, layout=self.layout)
            if self.use_bias:
                bb = b.astype(self.dtype)
                y = y + (bb.reshape(1, 1, 1, -1) if nhwc else bb.reshape(1, -1, 1, 1))
            return y
        if isinstance(self.padding, int):
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        else:
            pad = self.padding
        if nhwc:
            wk = w.astype(self.dtype).transpose(2, 3, 1, 0)       # HWIO
            dn = jax.lax.conv_dimension_numbers(
                x.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wk, window_strides=self.strides,
                padding=pad, dimension_numbers=dn)
            if self.use_bias:
                y = y + b.astype(self.dtype).reshape(1, 1, 1, -1)
            return y
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding=pad, dimension_numbers=dn)
        if self.use_bias:
            y = y + b.astype(self.dtype).reshape(1, -1, 1, 1)
        return y


class Linear(nn.Module):
    """Dense layer with a ``[out, in]`` ``weight`` param (torch layout)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_f = x.shape[-1]
        w = self.param("weight", _linear_kernel_init, (self.features, in_f), jnp.float32)
        y = jnp.einsum("...i,oi->...o", x.astype(self.dtype), w.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class GroupNorm(nn.Module):
    """GroupNorm with fp32 stats and three statistics modes:

    1. plain       — per-sample stats (no ctx, no injected stats);
    2. tile-pooled — stats pooled across lockstep-batched tiles (ctx given);
    3. injected    — fixed stats from a 'gn_stats' variable collection
                     (Tiled-VAE fast mode, ref tilevae.py:465-505: estimate
                     once on a downsampled image, then stream tiles).

    Running with ``mutable=['gn_stats']`` *records* this layer's stats so a
    later call can inject them.
    """

    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    layout: str = "NCHW"

    @nn.compact
    def __call__(self, x: jnp.ndarray, ctx: Optional[TileContext] = None,
                 affine_only: bool = False):
        from ..ops.groupnorm import apply_group_norm, group_stats

        if self.layout == "NHWC":
            # channels-last UNet path: plain per-sample stats only — the
            # tile-pooled and injected modes are Tiled-VAE (NCHW) features
            assert ctx is None and not self.has_variable("gn_stats", "stats")
            C = x.shape[-1]
            w = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
            b = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
            from ..ops.groupnorm import group_norm_affine_nhwc, group_norm_nhwc

            if affine_only:
                return group_norm_affine_nhwc(x, self.num_groups, w, b, self.eps)
            return group_norm_nhwc(x, self.num_groups, w, b,
                                   self.eps).astype(self.dtype)

        C = x.shape[1]
        w = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)

        if affine_only:
            # folded (a, b) for a fused normalize+silu+conv consumer
            from ..ops.groupnorm import group_norm_affine

            assert ctx is None and not self.has_variable("gn_stats", "stats")
            return group_norm_affine(x, self.num_groups, w, b, self.eps)

        if self.has_variable("gn_stats", "stats"):
            mean, var = self.get_variable("gn_stats", "stats")
            B_est = mean.shape[0]
            reps = x.shape[0] // B_est          # broadcast over tile axis
            mean = jnp.tile(mean, (reps, 1))
            var = jnp.tile(var, (reps, 1))
            return apply_group_norm(x, self.num_groups, mean, var, w, b, self.eps).astype(self.dtype)

        if self.is_mutable_collection("gn_stats"):
            mean, meansq, _ = group_stats(x, self.num_groups)
            var = jnp.maximum(meansq - mean * mean, 0.0)
            self.sow("gn_stats", "stats", (mean, var),
                     init_fn=lambda: (mean, var), reduce_fn=lambda old, new: new)
            return apply_group_norm(x, self.num_groups, mean, var, w, b, self.eps).astype(self.dtype)

        if ctx is None and _use_fused_group_norm():
            B, C, H, W = x.shape
            block_bytes = (C // self.num_groups) * H * W * 4
            if block_bytes <= 4 * 2**20:       # per-(b,g) block must fit VMEM
                from ..ops.pallas import fused_group_norm

                return fused_group_norm(x, self.num_groups, w, b,
                                        self.eps).astype(self.dtype)

        return tile_group_norm(x, self.num_groups, w, b, ctx, self.eps).astype(self.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (C,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (out * w + b).astype(self.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True, shift: int = 0) -> jnp.ndarray:
    """Sinusoidal timestep embedding [B] -> [B, dim] (diffusers convention)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - shift))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb
