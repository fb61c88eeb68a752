"""GroupNorm with externally supplied statistics — the heart of Tiled VAE.

The reference emulates a two-pass distributed GroupNorm with a cooperative
task queue that suspends every tile at each norm layer and weight-averages
per-tile *biased* variances (ref: scripts/tilevae.py:207-245, 289-335).

Here the same computation is a pair of pure functions:

  * ``group_stats``       — per-sample/group (mean, E[x^2], count), fp32,
                            optionally masked to the tile's owned region;
  * ``combine_group_stats`` — exact pooled stats across the tile axis using
                            the E[x^2] form (improves on tilevae.py:320-335,
                            which weight-averages biased vars — see
                            SURVEY.md §7 "hard parts (a)");
  * ``apply_group_norm``  — normalize with fixed stats + affine.

Under a sharded tile axis the combine step is a `psum` over ICI — the one
true cross-tile collective in the system (SURVEY.md §5).

Stats are always computed in float32: the reference's fp16-overflow fallback
(tilevae.py:302-304) becomes unconditional fp32 accumulation.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def group_stats(
    x: jnp.ndarray,
    num_groups: int,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-(batch, group) first/second moments of an NCHW tensor, in fp32.

    ``mask`` — optional [H, W] or [1, 1, H, W] 0/1 map restricting the stats
    to the tile's owned (crop-valid) pixels, giving exactly-once coverage of
    the canvas across tiles.

    Returns ``(mean, meansq, count)`` each of shape [B, G] (count is the
    number of contributing elements per group).
    """
    B, C, H, W = x.shape
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, G, C // G, H, W)
    if mask is None:
        n = jnp.full((B, G), C // G * H * W, dtype=jnp.float32)
        s1 = jnp.sum(xf, axis=(2, 3, 4))
        s2 = jnp.sum(xf * xf, axis=(2, 3, 4))
    else:
        m = mask.astype(jnp.float32).reshape(1, 1, 1, H, W)
        n = jnp.broadcast_to(jnp.sum(m, axis=(2, 3, 4)) * (C // G), (B, G))
        s1 = jnp.sum(xf * m, axis=(2, 3, 4))
        s2 = jnp.sum(xf * xf * m, axis=(2, 3, 4))
    return s1 / n, s2 / n, n


def combine_group_stats(
    means: jnp.ndarray, meansqs: jnp.ndarray, counts: jnp.ndarray, axis: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pool per-tile moments into exact global (mean, var) along ``axis``.

    mean = Σ nᵢ mᵢ / Σ nᵢ ;  var = Σ nᵢ E[x²]ᵢ / Σ nᵢ − mean².
    """
    total = jnp.sum(counts, axis=axis)
    mean = jnp.sum(means * counts, axis=axis) / total
    meansq = jnp.sum(meansqs * counts, axis=axis) / total
    var = jnp.maximum(meansq - mean * mean, 0.0)
    return mean, var


def combine_group_stats_reference(
    means: jnp.ndarray, vars_: jnp.ndarray, counts: jnp.ndarray, axis: int = 0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-parity pooling: pixel-count-weighted average of biased
    per-tile vars (ref tilevae.py:320-335).  Kept for output-compat mode."""
    total = jnp.sum(counts, axis=axis)
    w = counts / total
    return jnp.sum(means * w, axis=axis), jnp.sum(vars_ * w, axis=axis)


def apply_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Normalize NCHW ``x`` with fixed per-(batch, group) stats + affine.

    (ref custom_group_norm, tilevae.py:218-245; eps=1e-6 matches.)
    """
    B, C, H, W = x.shape
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, G, C // G, H, W)
    mu = mean.reshape(B, G, 1, 1, 1)
    rstd = jnp.reciprocal(jnp.sqrt(var.reshape(B, G, 1, 1, 1) + eps))
    out = ((xf - mu) * rstd).reshape(B, C, H, W)
    if weight is not None:
        out = out * weight.reshape(1, C, 1, 1)
    if bias is not None:
        out = out + bias.reshape(1, C, 1, 1)
    return out.astype(x.dtype)


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Plain (single-device, full-tensor) GroupNorm, fp32 stats."""
    mean, meansq, _ = group_stats(x, num_groups)
    var = jnp.maximum(meansq - mean * mean, 0.0)
    return apply_group_norm(x, num_groups, mean, var, weight, bias, eps)


def group_norm_fold(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """group_norm without materializing an f32 copy of the activation.

    The plain path upcasts x to f32 once and feeds BOTH the stats reduction
    and the normalize, so XLA materializes the shared f32 subexpression as
    an HLO temp (the v5e compile-OOM dump of DemoFusion's unrolled scale-3
    program showed 15 co-live 85 MB f32 ``norm2/convert_element_type``
    buffers).  Folding the stats into per-(batch, channel) (a, b) keeps
    every f32 value per-element inside fusions: one moment-pass read of
    bf16 x, one normalize-pass read, no full-size f32 temp.  ~2x the
    activation-memory efficiency per GroupNorm at identical math
    (summation order differs; f32-rounding-level drift only).
    Dispatch: MDU_GN=fold (see docs/TUNING.md).
    """
    a_c, b_c = group_norm_affine(x, num_groups, weight, bias, eps)
    return (x.astype(jnp.float32) * a_c[:, :, None, None]
            + b_c[:, :, None, None]).astype(x.dtype)


def group_norm_affine(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded GroupNorm affine: returns per-(batch, channel) f32 (a, b) with
    group_norm(x) == x * a + b.  One reduction pass over x; the normalize
    pass is left to the consumer (e.g. fused into a conv kernel)."""
    B, C, H, W = x.shape
    G = num_groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(2, 3))                     # [B, C]
    s2 = jnp.sum(xf * xf, axis=(2, 3))
    n = float(C // G * H * W)
    gmean = jnp.sum(s1.reshape(B, G, C // G), axis=2) / n
    gmeansq = jnp.sum(s2.reshape(B, G, C // G), axis=2) / n
    var = jnp.maximum(gmeansq - gmean * gmean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(gmean, C // G, axis=1)          # [B, C]
    rstd_c = jnp.repeat(rstd, C // G, axis=1)
    w = jnp.ones((C,), jnp.float32) if weight is None else weight.astype(jnp.float32)
    b = jnp.zeros((C,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    a_c = rstd_c * w[None, :]
    b_c = b[None, :] - mu_c * a_c
    return a_c, b_c


def group_norm_nhwc(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Plain GroupNorm on an NHWC tensor (TPU-native UNet layout).

    Channels-last keeps C on the lane dimension: the per-channel moment
    pass reduces over the sublane-major (H, W) axes and the group pool
    happens on a tiny [B, C] pair — same structure as
    ``group_norm_chanreduce`` without any activation transpose.
    """
    B, H, W, C = x.shape
    G = num_groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))                     # [B, C]
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    a_c, b_c = _fold_affine(s1, s2, B, C, G, H, W, weight, bias, eps)
    out = xf * a_c[:, None, None, :] + b_c[:, None, None, :]
    return out.astype(x.dtype)


def group_norm_affine_nhwc(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded GroupNorm affine for NHWC ``x``: per-(batch, channel) f32
    (a, b) with group_norm(x) == x * a + b (consumer fuses the normalize,
    e.g. the Pallas conv3x3 kernel)."""
    B, H, W, C = x.shape
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(1, 2))
    s2 = jnp.sum(xf * xf, axis=(1, 2))
    return _fold_affine(s1, s2, B, C, num_groups, H, W, weight, bias, eps)


def _fold_affine(s1, s2, B, C, G, H, W, weight, bias, eps):
    """Group-pool per-channel (Σx, Σx²) [B, C] into the folded per-channel
    normalize affine (a, b) f32."""
    n = float(C // G * H * W)
    gmean = jnp.sum(s1.reshape(B, G, C // G), axis=2) / n
    gmeansq = jnp.sum(s2.reshape(B, G, C // G), axis=2) / n
    var = jnp.maximum(gmeansq - gmean * gmean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mu_c = jnp.repeat(gmean, C // G, axis=1)          # [B, C]
    rstd_c = jnp.repeat(rstd, C // G, axis=1)
    w = jnp.ones((C,), jnp.float32) if weight is None else weight.astype(jnp.float32)
    b = jnp.zeros((C,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    a_c = rstd_c * w[None, :]
    b_c = b[None, :] - mu_c * a_c
    return a_c, b_c


def group_norm_chanreduce(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm via per-channel moments + tiny group pool, folded affine.

    Same math as ``group_norm`` but structured for the TPU scheduler:
      1. one pass computes per-channel (Σx, Σx²) as a [B, C] pair — no 5-D
         reshape of the activation, so XLA keeps the reduction on the native
         layout and fuses both moments into a single read;
      2. group pooling happens on the tiny [B, C] tensors;
      3. normalize+affine is folded to one fused `x * a + b` elementwise
         (a = w·rstd, b = β − μ·rstd·w), one read + one write.
    """
    B, C, H, W = x.shape
    G = num_groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(2, 3))                     # [B, C]
    s2 = jnp.sum(xf * xf, axis=(2, 3))                # [B, C]
    n = float(C // G * H * W)
    gmean = jnp.sum(s1.reshape(B, G, C // G), axis=2) / n          # [B, G]
    gmeansq = jnp.sum(s2.reshape(B, G, C // G), axis=2) / n
    var = jnp.maximum(gmeansq - gmean * gmean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)                   # [B, G]
    mu_c = jnp.repeat(gmean, C // G, axis=1)          # [B, C]
    rstd_c = jnp.repeat(rstd, C // G, axis=1)
    w = jnp.ones((C,), jnp.float32) if weight is None else weight.astype(jnp.float32)
    b = jnp.zeros((C,), jnp.float32) if bias is None else bias.astype(jnp.float32)
    a_c = rstd_c * w[None, :]                         # [B, C]
    b_c = b[None, :] - mu_c * a_c
    out = xf * a_c[:, :, None, None] + b_c[:, :, None, None]
    return out.astype(x.dtype)
