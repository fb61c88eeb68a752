"""3x3 'same' stride-1 conv expressed as MXU matmuls.

Motivation (docs/TUNING.md): XLA's conv_general_dilated reaches 47-60 TF/s
at SD UNet shapes on v5e while plain matmuls of the same operand sizes run
144-154 TF/s.  A 3x3 conv is algebraically 9 shifted [B*H*W, Cin] @
[Cin, Cout] matmuls (or one [B*H*W, 9*Cin] @ [9*Cin, Cout] im2col matmul),
so if XLA tiles those onto the MXU at matmul throughput the UNet's conv
floor (~1s of the 2.7s sampling step) drops substantially.

This replaces the convolution behind the reference's per-tile UNet calls
(ref tile_methods/multidiffusion.py:155-167) — the hottest loop in the
framework — with an MXU-native decomposition.  Opt-in via MDU_CONV_MM
(see models/layers.py) until the on-chip pipeline A/B confirms a win;
microbench: scripts/conv_matmul_bench.py.

Numerics: taps accumulate in fp32 (preferred_element_type) and cast back
to the input dtype, like XLA's own conv accumulation, so parity with
conv_general_dilated is exact at fp32 and within bf16 rounding otherwise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_mm"]


def _taps_nhwc(xp: jnp.ndarray, H: int, W: int):
    # static shifted views of the padded input, dy-major / dx-minor — the
    # same flattening order as w.transpose(2,3,1,0).reshape(9*C, O)
    for dy in range(3):
        for dx in range(3):
            yield dy, dx, xp[:, dy:dy + H, dx:dx + W, :]


def conv3x3_mm(x: jnp.ndarray, w: jnp.ndarray, mode: str = "9mm",
               layout: str = "NHWC") -> jnp.ndarray:
    """conv3x3(x, w), 'same' padding, stride 1, as shifted matmuls.

    x: [B,H,W,C] (layout='NHWC') or [B,C,H,W] (layout='NCHW')
    w: OIHW [O, C, 3, 3] (torch parameter layout, models/layers.py)
    mode: '9mm' (9 accumulated matmuls) or 'im2col' (one 9C-wide matmul)
    """
    if mode not in ("9mm", "im2col"):
        raise ValueError(f"unknown conv-mm mode {mode!r}")
    O = w.shape[0]
    if layout == "NHWC":
        B, H, W_, C = x.shape
        wt = w.transpose(2, 3, 1, 0)                      # HWIO
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        if mode == "im2col":
            cols = [xs for _, _, xs in _taps_nhwc(xp, H, W_)]
            xc = jnp.concatenate(cols, axis=-1).reshape(B * H * W_, 9 * C)
            y = jnp.dot(xc, wt.reshape(9 * C, O),
                        preferred_element_type=jnp.float32)
            return y.astype(x.dtype).reshape(B, H, W_, O)
        acc = jnp.zeros((B * H * W_, O), jnp.float32)
        for dy, dx, xs in _taps_nhwc(xp, H, W_):
            acc = acc + jnp.dot(xs.reshape(B * H * W_, C), wt[dy, dx],
                                preferred_element_type=jnp.float32)
        return acc.astype(x.dtype).reshape(B, H, W_, O)

    if layout != "NCHW":
        raise ValueError(f"unknown layout {layout!r}")
    B, C, H, W_ = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    if mode == "im2col":
        # taps stacked on a new leading axis -> one [9C, BHW] x [9C, O]
        # contraction; tap-major/channel-minor matches OIHW's (h, w, i)
        cols = jnp.stack([xp[:, :, dy:dy + H, dx:dx + W_]
                          for dy in range(3) for dx in range(3)], 0)
        xc = cols.transpose(0, 2, 1, 3, 4).reshape(9 * C, B * H * W_)
        # w OIHW -> (h,w,i)-major rows: [O, 9C]
        wf = w.transpose(2, 3, 1, 0).reshape(9 * C, O)
        y = jnp.dot(wf.T, xc, preferred_element_type=jnp.float32)  # [O, BHW]
        return (y.reshape(O, B, H, W_).transpose(1, 0, 2, 3)).astype(x.dtype)
    acc = jnp.zeros((B, O, H, W_), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, :, dy:dy + H, dx:dx + W_]
            acc = acc + jnp.einsum("bchw,oc->bohw", xs, w[:, :, dy, dx],
                                   preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)
