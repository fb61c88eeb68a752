"""Pallas TPU fused (normalize → silu →) conv3x3 kernel.

Motivation (docs/TUNING.md round-2 measurements): XLA's conv3x3 runs
47-60 TFLOP/s at SD UNet shapes vs the chip's 144-154 TFLOP/s matmul
roofline.  This kernel expresses the 3x3 convolution as 9 shifted
[rows, C] @ [C, bco] MXU matmuls over VMEM-resident blocks, optionally
applying a folded GroupNorm affine (x*a + b, per-(batch,channel)) and SiLU
to the input *inside* the kernel — eliminating the separate normalize and
activation HBM passes that precede every conv in a ResnetBlock
(ref eager equivalents: torch GroupNorm/SiLU/Conv2d chains).

Layout: NHWC (C on lanes).  The input is pre-padded by 1 pixel on H/W
(one cheap fused jnp.pad).  Grid: (B, H/bh, Co/bco) with the
output-channel axis innermost: the halo-overlapped input block (indexed
via pl.Element rows) stays resident across co-steps, and the activated
input is computed once per (b, h) into a VMEM scratch.  Co-blocking keeps
the weight slab under VMEM at 1280-channel levels (9·C·Co·2 bytes would
be 29.5 MiB unblocked).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(x_ref, w_ref, a_ref, b_ref, o_ref, xact_ref, acc_ref,
                 *, bh: int, H: int, W: int, fuse_act: bool):
    # x_ref: [1, bh+2, W+2, C]; w_ref: [9, C, bco]; a/b_ref: [B, C] (f32)
    # o_ref: [1, bh, W, bco]; xact_ref: [bh+2, W+2, C]; acc_ref: [bh*W, bco]
    C = x_ref.shape[3]
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _prep():
        x = x_ref[0]                               # [bh+2, W+2, C]
        if fuse_act:
            xf = x.astype(jnp.float32) * a_ref[bi] + b_ref[bi]
            xa = xf * jax.nn.sigmoid(xf)           # silu
            # the zero halo must STAY zero after the affine+silu ('same'
            # conv pads after activation): mask by padded position
            row = hi * bh + jax.lax.broadcasted_iota(
                jnp.int32, (bh + 2, W + 2, 1), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (bh + 2, W + 2, 1), 1)
            valid = ((row >= 1) & (row <= H) & (col >= 1) & (col <= W))
            x = jnp.where(valid, xa, 0.0).astype(x_ref.dtype)
        xact_ref[:] = x

    x = xact_ref[:]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            patch = x[dy:dy + bh, dx:dx + W, :].reshape(bh * W, C)
            acc_ref[:] += jax.lax.dot_general(
                patch, w_ref[dy * 3 + dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[:].reshape(bh, W, -1).astype(o_ref.dtype)


def _plan_blocks(H: int, W: int, C: int, Co: int,
                 vmem_budget: int = 9 * 2 ** 20) -> Optional[Tuple[int, int]]:
    """(bh, bco) whose working set fits VMEM, or None if nothing fits.

    Budget accounts for the double-buffered input/output blocks, the
    activated-input scratch, the weight slab, the f32 accumulator, and one
    materialized shifted patch (Mosaic stack)."""
    bcos = [Co] + [c for c in (512, 384, 256, 128) if c < Co and Co % c == 0]
    for bh in (32, 16, 8, 4, 2, 1):
        if H % bh and bh > 1:
            continue
        x_bytes = (bh + 2) * (W + 2) * C * 2
        patch_bytes = bh * W * C * 2
        for bco in bcos:
            w_bytes = 9 * C * bco * 2
            acc_bytes = bh * W * bco * 4
            o_bytes = bh * W * bco * 2
            total = (x_bytes * 3 + o_bytes * 2 + acc_bytes + w_bytes * 2
                     + 2 * patch_bytes)
            if total <= vmem_budget:
                return bh, bco
    return None


def conv3x3_plan_fits(H: int, W: int, C: int, Co: int) -> bool:
    return _plan_blocks(H, W, C, Co) is not None


@functools.partial(jax.jit, static_argnames=("fuse_act", "interpret", "block_h"))
def fused_conv3x3(
    x: jnp.ndarray,                 # [B, H, W, C]  NHWC
    w: jnp.ndarray,                 # [3, 3, C, Co] HWIO
    scale: Optional[jnp.ndarray] = None,    # [B, C] folded GN affine (f32)
    shift: Optional[jnp.ndarray] = None,    # [B, C]
    fuse_act: bool = False,
    block_h: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv3x3(silu(x*scale + shift)) in one kernel, 'same' padding.

    With ``fuse_act=False`` (scale/shift ignored) this is a plain conv3x3.
    Returns [B, H, W, Co].
    """
    B, H, W, C = x.shape
    Co = w.shape[3]
    plan = _plan_blocks(H, W, C, Co)
    if plan is None:
        raise ValueError(f"conv3x3 blocks do not fit VMEM for {x.shape}->{Co}")
    bh, bco = plan
    if block_h is not None:
        bh = block_h
    Hp = -(-H // bh) * bh

    xp = jnp.pad(x, ((0, 0), (1, 1 + Hp - H), (1, 1), (0, 0)))
    wf = w.reshape(9, C, Co)
    if scale is None:
        scale = jnp.ones((B, C), jnp.float32)
    if shift is None:
        shift = jnp.zeros((B, C), jnp.float32)

    grid = (B, Hp // bh, Co // bco)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, bh=bh, H=H, W=W, fuse_act=fuse_act),
        grid=grid,
        in_specs=[
            # overlapping halo rows: elementwise indexing (all dims must be
            # Element together); constant across the co axis, so the block
            # stays resident while output channels sweep
            pl.BlockSpec((pl.Element(1), pl.Element(bh + 2),
                          pl.Element(W + 2), pl.Element(C)),
                         lambda b, h, co: (b, h * bh, 0, 0)),
            pl.BlockSpec((9, C, bco), lambda b, h, co: (0, 0, co)),
            # whole [B, C] affine tables (tiny); row-indexed by program id
            pl.BlockSpec((B, C), lambda b, h, co: (0, 0)),
            pl.BlockSpec((B, C), lambda b, h, co: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bh, W, bco), lambda b, h, co: (b, h, 0, co)),
        out_shape=jax.ShapeDtypeStruct((B, Hp, W, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((bh + 2), (W + 2), C), x.dtype),
            pltpu.VMEM((bh * W, bco), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wf, scale.astype(jnp.float32), shift.astype(jnp.float32))
    return out[:, :H]
