"""Streaming exact Tiled VAE — fixed-HBM 8K decode/encode.

The lockstep mode (tiling/tiled_vae.py) holds every tile's activations in
HBM, which caps exact-mode resolution around 4K.  This module is the
TPU-native answer to the reference's zigzag VRAM<->RAM swap
(ref tilevae.py:581-652): tiles live in *host* memory; the network is
executed as a sequence of *segments* split at every GroupNorm; each segment
runs jit-compiled over fixed-size tile groups; per-group masked statistics
are pooled exactly (E[x²] form) on the host between segments.  Live HBM is
one tile-group's activations regardless of image size.

Differences from the reference's design:
  * groups of tiles run batched through one jitted segment program (the
    reference moves one tile at a time through eager ops);
  * statistics are exact pooled moments over owned regions, not
    halo-inflated biased-variance averages;
  * the op walk is *derived from the same modules* `Decoder.__call__` runs,
    and a parity test pins segmented == monolithic execution.
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import AutoencoderKL, AttnBlock, ResnetBlock
from ..models.layers import silu
from ..ops.groupnorm import apply_group_norm
from .tiled_vae import DECODER_PAD, ENCODER_PAD, plan_vae_tiles

# op kinds: ('conv', m) ('silu',) ('store_res', m) ('add_res',)
#           ('norm', m) — segment boundary; ('attn', m) ('down', m) ('up', m)


def _resnet_ops(rb: ResnetBlock):
    return [("store_res", rb), ("norm", rb.norm1), ("silu", None),
            ("conv", rb.conv1), ("norm", rb.norm2), ("silu", None),
            ("conv", rb.conv2), ("add_res", None)]


def _attn_ops(at: AttnBlock):
    return [("store_res", None), ("norm", at.group_norm), ("attn", at),
            ("add_res", None)]


def decoder_ops(vae_module: AutoencoderKL):
    """Flat op list mirroring Decoder.__call__ (incl. post_quant_conv)."""
    dec = vae_module.decoder
    cfg = vae_module.cfg
    chans = list(reversed(cfg.block_out_channels))
    ops = [("conv", vae_module.post_quant_conv), ("conv", dec.conv_in)]
    ops += _resnet_ops(dec.mid.block_1)
    ops += _attn_ops(dec.mid.attn_1)
    ops += _resnet_ops(dec.mid.block_2)
    for i in range(len(chans)):
        for j in range(cfg.layers_per_block + 1):
            ops += _resnet_ops(dec._blocks[f"up_{i}_block_{j}"])
        if i != len(chans) - 1:
            ops.append(("up", dec._blocks[f"up_{i}_upsample"]))
    ops += [("norm", dec.norm_out), ("silu", None), ("conv", dec.conv_out)]
    return ops


def encoder_ops(vae_module: AutoencoderKL):
    """Flat op list mirroring Encoder.__call__ (incl. quant_conv)."""
    enc = vae_module.encoder
    cfg = vae_module.cfg
    ops = [("conv", enc.conv_in)]
    for i in range(len(cfg.block_out_channels)):
        for j in range(cfg.layers_per_block):
            ops += _resnet_ops(enc._blocks[f"down_{i}_block_{j}"])
        if i != len(cfg.block_out_channels) - 1:
            ops.append(("down", enc._blocks[f"down_{i}_downsample"]))
    ops += _resnet_ops(enc.mid.block_1)
    ops += _attn_ops(enc.mid.attn_1)
    ops += _resnet_ops(enc.mid.block_2)
    ops += [("norm", enc.norm_out), ("silu", None), ("conv", enc.conv_out),
            ("conv", vae_module.quant_conv)]
    return ops


def _segment_spans(kinds: List[str]) -> List[Tuple[int, int]]:
    """Split op indices into segments ending just before each 'norm'.

    Returns (start, end) half-open spans; a span's leading op may be a
    'norm' (applied with pre-pooled statistics)."""
    spans = []
    start = 0
    for i, k in enumerate(kinds):
        if k == "norm" and i > start:
            spans.append((start, i))
            start = i
    spans.append((start, len(kinds)))
    return spans


def _mask_at(base_mask: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    bh, bw = base_mask.shape[-2], base_mask.shape[-1]
    if (h, w) == (bh, bw):
        return base_mask
    if bh % h == 0 and bw % w == 0:
        return base_mask[..., :: bh // h, :: bw // w]
    return jnp.repeat(jnp.repeat(base_mask, h // bh, axis=-2), w // bw, axis=-1)


def _masked_stats(x: jnp.ndarray, mask: jnp.ndarray, groups: int):
    """Partial sums (s1, s2, n) per (row, group) for exact pooling."""
    TB, C, H, W = x.shape
    G = groups
    xf = x.astype(jnp.float32).reshape(TB, G, C // G, H, W)
    m = _mask_at(mask, H, W).reshape(TB, 1, 1, H, W).astype(jnp.float32)
    s1 = jnp.sum(xf * m, axis=(2, 3, 4))
    s2 = jnp.sum(xf * xf * m, axis=(2, 3, 4))
    n = jnp.broadcast_to(jnp.sum(m, axis=(2, 3, 4)) * (C // G), s1.shape)
    return s1, s2, n


def _make_segment_fn(vae: AutoencoderKL, params: Any, which: str,
                     seg_index: int, spans, want_stats: bool):
    """Jitted: (x, res, base_mask, stats) -> (x', res', partial stats or None)."""
    groups = vae.cfg.norm_num_groups

    def method(module, x, res, base_mask, stats):
        ops = decoder_ops(module) if which == "decoder" else encoder_ops(module)
        start, end = spans[seg_index]
        for kind, m in ops[start:end]:
            if kind == "norm":
                mean, var = stats          # pooled, [rows, G]
                w = m.variables["params"]["weight"]
                b = m.variables["params"]["bias"]
                x = apply_group_norm(x, groups, mean, var, w, b).astype(x.dtype)
            elif kind == "conv":
                x = m(x)
            elif kind == "silu":
                x = silu(x)
            elif kind == "store_res":
                res = m.shortcut(x) if m is not None else x
            elif kind == "add_res":
                x = x + res
                res = jnp.zeros((1,), x.dtype)   # free the slot
            elif kind == "attn":
                x = m.attend(x)
            elif kind in ("down", "up"):
                x = m(x)
        out_stats = _masked_stats(x, base_mask, groups) if want_stats else None
        return x, res, out_stats

    def run(p, x, res, base_mask, stats):
        # params travel as a jit argument — closing over them would embed
        # the weight tree as HLO constants (see CLAUDE.md)
        return vae.apply(p, x, res, base_mask, stats, method=method)

    jitted = jax.jit(run)
    return lambda x, res, base_mask, stats: jitted(params, x, res, base_mask, stats)


def _pool(parts, B):
    """Pool per-row partial sums into per-batch-element (mean, var) [B, G]."""
    tot1 = tot2 = totn = None
    for p1, p2, pn in parts:
        # rows are tile-major, batch-minor: fold rows into batch slots
        r = np.asarray(p1, np.float64).reshape(-1, B, p1.shape[-1]).sum(0)
        r2 = np.asarray(p2, np.float64).reshape(-1, B, p2.shape[-1]).sum(0)
        rn = np.asarray(pn, np.float64).reshape(-1, B, pn.shape[-1]).sum(0)
        tot1 = r if tot1 is None else tot1 + r
        tot2 = r2 if tot2 is None else tot2 + r2
        totn = rn if totn is None else totn + rn
    mean = tot1 / totn
    var = np.maximum(tot2 / totn - mean * mean, 0.0)
    return mean.astype(np.float32), var.astype(np.float32)


def auto_group_size(which: str, in_h: int, in_w: int, B: int,
                    requested: int, prefetch: bool,
                    dtype_bytes: int = 2) -> Tuple[int, bool]:
    """Clamp the tile-group size to the HBM budget (MDU_HBM_BYTES).

    The live set is one group's widest-segment working set — ~5 tensors of
    the 128-channel full-tile-resolution activation (see
    tiled_vae.segment_tile_bytes) — DOUBLED when the window-of-1 prefetch
    keeps group g+1 in flight while g drains to the host.  Returns
    (group_size, prefetch): the group shrinks first; if even a single tile
    with prefetch busts the budget, prefetch is dropped before giving up.

    Round-3 postmortem this encodes: an 8192px encode with 1024px tiles has
    a 1088^2 x 128ch first segment = ~300 MB/tile/tensor; group 4 with
    prefetch wanted ~24 GB and OOM'd a 16 GB v5e.
    """
    import os

    per_tile = 128 * in_h * in_w * dtype_bytes * 5 * B
    budget = int(os.environ.get("MDU_HBM_BYTES", str(10 * 2 ** 30)))
    try:
        # prefer live headroom: a resident UNet (~1.7 GB bf16) eats into the
        # static budget; leave 1 GiB slack for allocator fragmentation
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            free = limit - stats.get("bytes_in_use", 0) - 2 ** 30
            budget = max(min(budget, free), 2 ** 30)
    except Exception:                   # noqa: BLE001 — stats are optional
        pass
    want_prefetch = prefetch
    g = max(1, min(requested, budget // (per_tile * (2 if prefetch else 1))))
    if g == 1 and prefetch and 2 * per_tile > budget:
        prefetch = False
    if g != requested or prefetch != want_prefetch:
        import sys
        print(f"[Tiled VAE] streaming {which}: group {requested} -> {g}"
              f"{', prefetch off' if want_prefetch and not prefetch else ''}"
              f" to fit {budget / 2**30:.1f} GiB HBM budget", file=sys.stderr)
    return g, prefetch


def streaming_tiled_vae(
    vae: AutoencoderKL,
    params: Any,
    x: jnp.ndarray,
    which: str = "decoder",
    tile_size: int = 96,
    group_size: int = 4,
    host_resident: bool = True,
    spill_dtype: Optional[str] = None,
) -> Optional[jnp.ndarray]:
    """Exact tiled decode/encode with bounded live activations.

    ``host_resident=True`` — tiles live in host memory between segments (the
    8K path: fixed HBM, pays host<->device traffic per segment).
    ``host_resident=False`` — tiles stay in HBM between segments; only one
    group's *working set* is live inside a segment, so the peak is
    one-layer-of-all-tiles + one group's activations.  Covers the 4-6K
    range where all-layers lockstep would OOM but one layer still fits —
    no host traffic at all.

    ``spill_dtype`` (or env ``MDU_SPILL_DTYPE``), e.g. ``float8_e4m3fn`` —
    compress the host-resident inter-segment spills: activations are cast
    on-device before readback and widened after upload, halving the
    per-segment host<->device traffic vs bf16 (the PCIe/relay-bandwidth
    lever, docs/TUNING.md 8K-envelope notes).  Slightly lossy (the next
    GroupNorm's pooled stats are computed pre-compression and renormalize
    most of the quantization error); the final segment's output and the
    exact pooled statistics always stay uncompressed.

    Returns None when the input is small enough to bypass tiling (caller
    should use the direct path).
    """
    pad = DECODER_PAD if which == "decoder" else ENCODER_PAD
    plan = plan_vae_tiles(x.shape[2], x.shape[3], tile_size, pad)
    if plan is None:
        return None

    B = x.shape[0]
    T = plan.num_tiles
    in_side_h = plan.in_h * (8 if which == "decoder" else 1)
    in_side_w = plan.in_w * (8 if which == "decoder" else 1)
    prefetch = host_resident
    group_size, prefetch = auto_group_size(
        which, in_side_h, in_side_w, B, min(group_size, T), prefetch)
    # pad tile count to a group multiple; pad tiles have zero masks
    Tp = -(-T // group_size) * group_size

    # gather tiles [Tp*B, C, th, tw]
    if host_resident:
        # zero-copy for host (numpy) inputs: the 8K path should never bounce
        # the full canvas through the device
        xnp = np.asarray(x)
        xs = np.zeros((Tp * B, x.shape[1], plan.in_h, plan.in_w), xnp.dtype)
        for t, (oy, ox) in enumerate(plan.in_origins):
            xs[t * B:(t + 1) * B] = xnp[:, :, oy:oy + plan.in_h, ox:ox + plan.in_w]
    else:
        xs = jnp.concatenate(
            [jax.lax.dynamic_slice(
                x, (0, 0, oy, ox),
                (B, x.shape[1], plan.in_h, plan.in_w))
             for (oy, ox) in plan.in_origins]
            + [jnp.zeros((B * (Tp - T), x.shape[1], plan.in_h, plan.in_w),
                         x.dtype)] * (1 if Tp > T else 0), axis=0)
    masks = plan.local_masks()                              # [T,1,th,tw]
    masks = np.concatenate(
        [masks, np.zeros((Tp - T,) + masks.shape[1:], np.float32)], axis=0)
    masks = np.repeat(masks, B, axis=0)                     # [Tp*B,1,th,tw]

    # derive segment structure once (shape-independent)
    bound = vae.bind(params)
    ops = decoder_ops(bound) if which == "decoder" else encoder_ops(bound)
    kinds = [k for k, _ in ops]
    spans = _segment_spans(kinds)

    seg_fns = [
        _make_segment_fn(vae, params, which, i, spans,
                         want_stats=(i < len(spans) - 1))
        for i in range(len(spans))
    ]

    n_groups = Tp // group_size
    rows = group_size * B
    cur: List[Any] = [xs[g * rows:(g + 1) * rows] for g in range(n_groups)]
    res: List[Optional[Any]] = [None] * n_groups
    if host_resident:
        gmasks = [masks[g * rows:(g + 1) * rows] for g in range(n_groups)]
    else:
        jm = jnp.asarray(masks)
        gmasks = [jm[g * rows:(g + 1) * rows] for g in range(n_groups)]

    import os

    sd = os.environ.get("MDU_SPILL_DTYPE") or spill_dtype
    spill = jnp.dtype(sd) if (sd and host_resident) else None

    stats = None
    for si in range(len(spans)):
        parts = []
        last_seg = si == len(spans) - 1
        st_in = (None if stats is None else
                 (jnp.asarray(np.tile(stats[0], (group_size, 1))),
                  jnp.asarray(np.tile(stats[1], (group_size, 1)))))

        def launch(g):
            r_in = (jnp.zeros((1,), x.dtype) if res[g] is None
                    else jnp.asarray(res[g]).astype(x.dtype))
            return seg_fns[si](jnp.asarray(cur[g]).astype(x.dtype), r_in,
                               jnp.asarray(gmasks[g]), st_in)

        def spill_host(a):
            # compressed spill: cast on-device (VPU) so the host transfer
            # moves 1 byte/elt; the result segment stays full precision
            if spill is not None and not last_seg:
                a = a.astype(spill)
            return np.asarray(a)

        if host_resident and prefetch:
            # window-of-1 prefetch: group g+1's device work is enqueued
            # before group g's host conversion blocks (the zigzag-swap
            # overlap, but async-dispatch shaped).  Doubles the live HBM;
            # auto_group_size accounts for it
            pending = launch(0)
            for g in range(n_groups):
                nxt = launch(g + 1) if g + 1 < n_groups else None
                xg, rg, pg = pending
                cur[g] = spill_host(xg)
                res[g] = spill_host(rg)
                if pg is not None:
                    parts.append(pg)
                pending = nxt
        elif host_resident:
            # budget too tight for double-buffering: fully serialize
            for g in range(n_groups):
                xg, rg, pg = launch(g)
                cur[g] = spill_host(xg)
                res[g] = spill_host(rg)
                if pg is not None:
                    parts.append(pg)
        else:
            # device-resident: serialize groups so only one working set is
            # live at a time (async dispatch would hold them all)
            for g in range(n_groups):
                xg, rg, pg = launch(g)
                jax.block_until_ready(xg)
                cur[g] = xg
                res[g] = rg
                if pg is not None:
                    parts.append(pg)
        stats = _pool(parts, B) if parts else None

    # assemble owned regions into the output canvas
    scale_num, scale_den = (8, 1) if which == "decoder" else (1, 8)
    C_out = cur[0].shape[1]
    H_out = plan.h * scale_num // scale_den
    W_out = plan.w * scale_num // scale_den
    out = np.zeros((B, C_out, H_out, W_out), cur[0].dtype)
    s = lambda v: v * scale_num // scale_den
    for t, ((oy, ox), (y0, y1, x0, x1)) in enumerate(
            zip(plan.in_origins, plan.owned)):
        g, k = divmod(t, group_size)
        tile = cur[g][k * B:(k + 1) * B]
        out[:, :, s(y0):s(y1), s(x0):s(x1)] = \
            tile[:, :, s(y0 - oy):s(y1 - oy), s(x0 - ox):s(x1 - ox)]
    # host-resident callers get the canvas as host memory: an 8192^2 decode
    # is ~0.8 GB — bouncing it through the device (and the remote tunnel)
    # buys nothing
    return out if host_resident else jnp.asarray(out)
