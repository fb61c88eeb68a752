"""Pallas fused tile-blend kernel: scatter-add + normalize in one pass.

The MultiDiffusion fusion the reference runs as a Python scatter loop plus a
final divide (ref multidiffusion.py:166-167, 208) is re-expressed as a
*gather*: the grid walks canvas blocks; each block pulls the overlapping
windows of its (statically known) contributor tiles from HBM via async DMA
into VMEM, accumulates them in fp32, and divides by the paint-count weights
— one HBM pass over the output instead of T read-modify-write passes.

Geometry is static, so the contributor table (tile index + offset per canvas
block) is built host-side and fed through scalar prefetch.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.bbox import BBox


def build_contributor_table(
    h: int, w: int, bboxes: Sequence[BBox], block_h: int, block_w: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Per canvas block: indices of tiles overlapping it + their (dy, dx)
    relative offsets (tile origin minus block origin).  Padded with -1."""
    nby = -(-h // block_h)
    nbx = -(-w // block_w)
    table = []
    for by in range(nby):
        for bx in range(nbx):
            y0, x0 = by * block_h, bx * block_w
            y1, x1 = min(y0 + block_h, h), min(x0 + block_w, w)
            entries = []
            for t, b in enumerate(bboxes):
                if b.x < x1 and b.x + b.w > x0 and b.y < y1 and b.y + b.h > y0:
                    entries.append((t, b.y - y0, b.x - x0))
            table.append(entries)
    k_max = max(len(e) for e in table)
    idx = np.full((len(table), k_max), -1, np.int32)
    offs = np.zeros((len(table), k_max, 2), np.int32)
    for i, entries in enumerate(table):
        for k, (t, dy, dx) in enumerate(entries):
            idx[i, k] = t
            offs[i, k] = (dy, dx)
    return idx, offs, k_max


def _blend_kernel(idx_ref, offs_ref, tiles_hbm, weights_ref, out_ref,
                  pad_ref, sem, *, th: int, tw: int, bh: int, bw: int,
                  k_max: int, normalize: bool):
    bid = pl.program_id(0)
    C = out_ref.shape[0]
    acc = jnp.zeros((C, bh, bw), jnp.float32)

    def body(k, acc):
        tid = idx_ref[bid, k]
        dy = offs_ref[bid, k, 0]
        dx = offs_ref[bid, k, 1]

        def add(acc):
            # stage the tile at the origin of a zeroed (th+bh, tw+bw) buffer,
            # then CYCLICALLY rotate by the (dynamic) offset: out(i,j) <-
            # tile[i-dy, j-dx], with out-of-tile positions wrapping into the
            # zero margin.  Mosaic supports dynamic rotates; dynamic-start
            # lane slices it does not.
            pad_ref[:] = jnp.zeros_like(pad_ref)
            cp = pltpu.make_async_copy(
                tiles_hbm.at[tid], pad_ref.at[:, pl.ds(0, th), pl.ds(0, tw)], sem)
            cp.start()
            cp.wait()
            rolled = pltpu.roll(pltpu.roll(pad_ref[:], jnp.mod(dy, th + bh), 1),
                                jnp.mod(dx, tw + bw), 2)
            return acc + rolled[:, :bh, :bw].astype(jnp.float32)

        return jax.lax.cond(tid >= 0, add, lambda a: a, acc)

    acc = jax.lax.fori_loop(0, k_max, body, acc)
    if normalize:
        wgt = weights_ref[:]                   # [bh, bw]
        acc = jnp.where(wgt > 1.0, acc / wgt, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "bboxes", "normalize",
                                              "interpret"))
def fused_tile_blend(
    tiles: jnp.ndarray,          # [T, C, th, tw] tile outputs
    weights: jnp.ndarray,        # [h, w] paint counts
    h: int, w: int,
    bboxes: Tuple[BBox, ...],
    normalize: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """Tile fusion in one gather pass.

    ``normalize=True``  — MultiDiffusion: sum overlapping tiles, divide
                          where count > 1 (ref multidiffusion.py:208).
    ``normalize=False`` — raw scatter-add sum: Mixture-of-Diffusers tiles
                          arrive pre-multiplied by gaussian x 1/sum-weights
                          maps (ref mixtureofdiffusers.py:125-126), and
                          MD-with-regions defers the divide until region
                          contributions are added.

    Returns the fused canvas [C, h, w].  Canvas blocks are the tile size
    rounded up to Mosaic's (8, 128) tiling (the staging-window bounds hold
    for any block >= 0: dy, dx in (-t, b) => slice start in [0, b+t]).
    """
    T, C, th, tw = tiles.shape
    # block dims must be multiples of (8, 128) for the TPU lowering
    bh = -(-th // 8) * 8
    bw = -(-tw // 128) * 128
    # pad the canvas to block multiples; weights pad with 1 (no divide)
    hp = -(-h // bh) * bh
    wp = -(-w // bw) * bw
    wpad = jnp.pad(weights, ((0, hp - h), (0, wp - w)), constant_values=1.0)

    idx, offs, k_max = build_contributor_table(h, w, bboxes, bh, bw)
    nblocks = idx.shape[0]
    nbx = wp // bw

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                  # tiles in HBM
            pl.BlockSpec((bh, bw), lambda b, idx, offs: (b // nbx, b % nbx)),
        ],
        out_specs=pl.BlockSpec((C, bh, bw),
                               lambda b, idx, offs: (0, b // nbx, b % nbx)),
        scratch_shapes=[
            pltpu.VMEM((C, th + bh, tw + bw), tiles.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_blend_kernel, th=th, tw=tw, bh=bh, bw=bw,
                          k_max=k_max, normalize=normalize),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, hp, wp), tiles.dtype),
        interpret=interpret,
    )(jnp.asarray(idx), jnp.asarray(offs), tiles, wpad)
    return out[:, :h, :w]
