"""DemoFusion — progressive xN upscaling with local windows + global
dilated views (arXiv 2311.16973).

TPU-native re-design of ref tile_methods/demofusion.py +
scripts/tileglobal.py.  The reference drives this through three nested
hijacks (p.sample, model_wrap_cfg.forward, inner forward); here each phase
is an ordinary img2img sampling run whose denoiser is a DemoFusion
combinator:

  per step (ref demofusion.py:185-324):
    cosf   = 0.5 (1 + cos(pi (step+1)/(t_enc+1)))
    x     <- x (1-c1) + (lat0 + noise sigma) c1          skip residual, c1=cosf^s1
    local  = uniform-average fusion over jittered windows
    global = fusion over s^2 dilated views x[..., o::s] of a
             gaussian-blurred (sigma = sig c3) copy; 'mixture' runs half the
             views on the unblurred input and halves the sum
    out    = local (1-c2) + global c2

  per phase (ref tileglobal.py:274-362):
    latents <- bicubic upscale; re-noise via truncated schedule;
    mean/std re-anchored to the phase-1 anchor.

Conds carry the full contract (ref consumes standard A1111 conds,
demofusion.py:219-324): scheduled banks and AND composition resolve per
step via the pipeline's cond machinery, and canvas-shaped leaves (inpaint
'concat', ControlNet hints) are sliced per window / per dilated view.

Window jitter is *key-threaded* (SURVEY.md §7 hard part c): windows sit at
static base positions inside a jr-padded canvas and the per-phase random
offsets enter the jitted program as a traced [n_windows, 2] array consumed
by lax.dynamic_slice — shapes stay static, so repeated DemoFusion calls
reuse the compiled executables from the pipeline's jit cache (the reference
re-jitters per phase in get_views, tileglobal.py:322, and pays nothing
because it is eager; we'd pay a full XLA retrace without this).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DemoFusionConfig, SamplerConfig
from ..ops.blur import gaussian_blur_nchw
from ..ops.resize import resize_nchw
from ..samplers.samplers import (STATIC_SIGMA_SAMPLERS, STOCHASTIC_SAMPLERS,
                                 get_sampler)
from ..utils.bbox import BBox
from ..utils.grid import batch_bboxes

LATENT_TO_PIXEL = 8


@dataclass(frozen=True)
class DemoFusionPhasePlan:
    scale: int
    h: int                       # latent canvas (this phase)
    w: int
    tile: int
    jitter: int                  # max |offset|; canvas padded by this much
    windows: Tuple[BBox, ...]    # UN-jittered bases in *unpadded* coords
    window_batches: Tuple[Tuple[int, ...], ...]       # index batches
    jitter_lo: Tuple[Tuple[int, int], ...]            # per-window (dy,dx) min
    jitter_hi: Tuple[Tuple[int, int], ...]            # per-window (dy,dx) max
    global_offsets: Tuple[Tuple[int, int], ...]   # (oy, ox), doubled if mixture
    global_batches: Tuple[Tuple[Tuple[int, int], ...], ...]

    def cache_key(self):
        return (self.scale, self.h, self.w, self.tile, self.jitter,
                self.windows, self.global_offsets)


def plan_demofusion_phase(
    h: int, w: int, scale: int, cfg: DemoFusionConfig,
) -> DemoFusionPhasePlan:
    """Window grid (ref demofusion.py:101-138) + dilated global offsets
    (ref :87-99).  Jitter *ranges* are static; the draw happens per call."""
    tile = min(cfg.window_size, min(h, w))
    overlap = max(0, min(cfg.overlap, tile - 4))
    stride = max(4, tile - overlap)

    cols = max(1, math.ceil((w - overlap) / (tile - overlap)))
    rows = max(1, math.ceil((h - overlap) / (tile - overlap)))
    dx = (w - tile) / (cols - 1) if cols > 1 else 0.0
    dy = (h - tile) / (rows - 1) if rows > 1 else 0.0

    jitter = 0
    if cfg.random_jitter:
        jitter = min(max((min(w, h) - stride) // 4, 0),
                     min(tile // 2, overlap // 2))

    windows: List[BBox] = []
    lo: List[Tuple[int, int]] = []
    hi: List[Tuple[int, int]] = []
    for r in range(rows):
        for c in range(cols):
            y = min(int(r * dy), h - tile)
            x = min(int(c * dx), w - tile)
            windows.append(BBox(x, y, tile, tile))
            # interior windows jitter both ways; edge windows only inward
            # (ref split_bboxes_jitter, demofusion.py:116-134)
            lo.append((-jitter if y != 0 else 0, -jitter if x != 0 else 0))
            hi.append((jitter if y + tile != h else 0,
                       jitter if x + tile != w else 0))

    offsets = [(oy, ox) for oy in range(scale) for ox in range(scale)]
    if cfg.mixture:
        offsets = offsets + offsets

    idx_batches = tuple(tuple(b) for b in
                        batch_bboxes(list(range(len(windows))), cfg.tile_bs))
    return DemoFusionPhasePlan(
        scale=scale, h=h, w=w, tile=tile, jitter=jitter,
        windows=tuple(windows), window_batches=idx_batches,
        jitter_lo=tuple(lo), jitter_hi=tuple(hi),
        global_offsets=tuple(offsets),
        global_batches=tuple(tuple(b) for b in batch_bboxes(offsets, cfg.tile_bs_g)),
    )


def draw_jitter(plan: DemoFusionPhasePlan, rng: np.random.Generator) -> np.ndarray:
    """Per-phase random window offsets, drawn host-side -> traced arg."""
    out = np.zeros((len(plan.windows), 2), np.int32)
    for i, (lo, hi) in enumerate(zip(plan.jitter_lo, plan.jitter_hi)):
        out[i, 0] = rng.integers(lo[0], hi[0] + 1)
        out[i, 1] = rng.integers(lo[1], hi[1] + 1)
    return out


# --------------------------------------------------------- cond slicing


def _map_cond(c, leaf_fn):
    """tree-map preserving AND structure (weights untouched)."""
    if c is None:
        return None
    if isinstance(c, dict) and "__and__" in c:
        out = {"__and__": [_map_cond(p, leaf_fn) for p in c["__and__"]]}
        if "__weights__" in c:
            out["__weights__"] = c["__weights__"]
        return out
    return jax.tree.map(leaf_fn, c)


def _map_cond_strip(c, leaf_fn):
    """tree-map that DROPS AND ``__weights__`` (static floats) — shard_map
    in_specs trees must be arrays-only; the shard body re-attaches them
    (same contract as conds.py::tile_cond_stacked)."""
    if c is None:
        return None
    if isinstance(c, dict) and "__and__" in c:
        return {"__and__": [_map_cond_strip(p, leaf_fn) for p in c["__and__"]]}
    return jax.tree.map(leaf_fn, c)


def _and_weights(c):
    return (c["__weights__"] if isinstance(c, dict) and "__and__" in c
            else None)


def _attach_weights(c, w):
    if c is not None and w is not None and isinstance(c, dict) and "__and__" in c:
        return {**c, "__weights__": w}
    return c


def _pad_spatial(c, jr: int, hw: Tuple[int, int]):
    """Pad canvas-shaped cond leaves like the latent canvas is padded."""
    if jr == 0:
        return c
    H, W = hw
    f = LATENT_TO_PIXEL

    def pad(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H, W):
            return jnp.pad(leaf, ((0, 0), (0, 0), (jr, jr), (jr, jr)))
        if leaf.ndim == 4 and leaf.shape[2:] == (H * f, W * f):
            return jnp.pad(leaf, ((0, 0), (0, 0), (jr * f, jr * f), (jr * f, jr * f)))
        return leaf

    return _map_cond(c, pad)


def _window_cond(c_pad, offs, tile: int, hw: Tuple[int, int], jr: int):
    """Per-window cond batch with *traced* (y, x) offsets — the dynamic
    analogue of tiling/conds.py::tile_cond (tile-major concat)."""
    if c_pad is None:
        return None
    H, W = hw
    f = LATENT_TO_PIXEL
    K = len(offs)

    def slice_leaf(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H + 2 * jr, W + 2 * jr):
            return jnp.concatenate([
                jax.lax.dynamic_slice(
                    leaf, (0, 0, oy, ox),
                    (leaf.shape[0], leaf.shape[1], tile, tile))
                for oy, ox in offs], axis=0)
        if leaf.ndim == 4 and leaf.shape[2:] == ((H + 2 * jr) * f, (W + 2 * jr) * f):
            return jnp.concatenate([
                jax.lax.dynamic_slice(
                    leaf, (0, 0, oy * f, ox * f),
                    (leaf.shape[0], leaf.shape[1], tile * f, tile * f))
                for oy, ox in offs], axis=0)
        return jnp.concatenate([leaf] * K, axis=0)

    return _map_cond(c_pad, slice_leaf)


def _window_cond_stacked(c_pad, offs_list, tile: int, hw: Tuple[int, int],
                         jr: int):
    """Per-window cond with an explicit leading window axis ``[K, B, ...]``
    and *traced* (y, x) offsets — the form the mesh path shards over the
    'tiles' axis (AND ``__weights__`` stripped; re-attached in the body)."""
    if c_pad is None:
        return None
    H, W = hw
    f = LATENT_TO_PIXEL
    K = len(offs_list)

    def slice_leaf(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H + 2 * jr, W + 2 * jr):
            return jnp.stack([
                jax.lax.dynamic_slice(
                    leaf, (0, 0, oy, ox),
                    (leaf.shape[0], leaf.shape[1], tile, tile))
                for oy, ox in offs_list])
        if leaf.ndim == 4 and leaf.shape[2:] == ((H + 2 * jr) * f, (W + 2 * jr) * f):
            return jnp.stack([
                jax.lax.dynamic_slice(
                    leaf, (0, 0, oy * f, ox * f),
                    (leaf.shape[0], leaf.shape[1], tile * f, tile * f))
                for oy, ox in offs_list])
        return jnp.broadcast_to(leaf[None], (K,) + leaf.shape)

    return _map_cond_strip(c_pad, slice_leaf)


def _dilated_cond_stacked(c, views, scale: int, hw: Tuple[int, int]):
    """:func:`_dilated_cond` with a leading view axis ``[K, B, ...]``
    (static offsets — dilated views never jitter), weights stripped."""
    if c is None:
        return None
    H, W = hw
    K = len(views)
    f = LATENT_TO_PIXEL

    def slice_leaf(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H, W):
            return jnp.stack(
                [leaf[:, :, oy::scale, ox::scale] for oy, ox in views])
        if leaf.ndim == 4 and leaf.shape[2:] == (H * f, W * f):
            from ..ops.resize import resize_nchw
            from .conds import dequantize_hint

            small = resize_nchw(dequantize_hint(leaf),
                                (H // scale * f, W // scale * f), "linear")
            return jnp.broadcast_to(small[None], (K,) + small.shape)
        return jnp.broadcast_to(leaf[None], (K,) + leaf.shape)

    return _map_cond_strip(c, slice_leaf)


def _resolve_df_scan(cfg, plan=None) -> bool:
    """cfg.scan_windows; unset -> env MDU_DF_SCAN (1/0), else auto: engage
    once the phase would inline >= MDU_TILE_SCAN_THRESHOLD (default 8)
    denoiser calls — the same unroll-vs-compile-time threshold as the tiled
    grid (schedulers.py::_resolve_tile_scan).  An unrolled scale-3 SDXL
    phase (18 calls) fails AOT compilation outright on 16 GiB chips."""
    import os

    if cfg.scan_windows is not None:
        return bool(cfg.scan_windows)
    env = os.environ.get("MDU_DF_SCAN")
    if env is not None:
        return env == "1"
    if plan is None:
        return False
    thresh = int(os.environ.get("MDU_TILE_SCAN_THRESHOLD", "8"))
    return len(plan.window_batches) + len(plan.global_batches) >= thresh


def _pad_batches(batches, bs: int):
    """Pad index batches to uniform width ``bs`` by duplicating the last
    entry with weight 0 — the scan-grid convention (schedulers.py scan grid).
    Returns (idx [nb, bs] int32, weight [nb, bs] f32)."""
    import numpy as _np

    nb = len(batches)
    idx = _np.zeros((nb, bs), _np.int32)
    wm = _np.zeros((nb, bs), _np.float32)
    for bi, batch in enumerate(batches):
        for k in range(bs):
            idx[bi, k] = batch[min(k, len(batch) - 1)]
            wm[bi, k] = 1.0 if k < len(batch) else 0.0
    return idx, wm


def _dilated_cond_dyn(c, oys, oxs, K: int, scale: int, hw: Tuple[int, int]):
    """_dilated_cond with *traced* per-view offsets (scan bodies cannot use
    ``oy::s`` strided slicing): canvas leaves go through reshape-and-take,
    offset-independent leaves replicate exactly as the static path does."""
    if c is None:
        return None
    H, W = hw
    f = LATENT_TO_PIXEL

    def slice_leaf(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H, W):
            B0, C0 = leaf.shape[0], leaf.shape[1]
            lr = leaf.reshape(B0, C0, H // scale, scale, W // scale, scale)
            return jnp.concatenate([
                jnp.take(jnp.take(lr, oys[k], axis=3), oxs[k], axis=4)
                for k in range(K)], axis=0)
        if leaf.ndim == 4 and leaf.shape[2:] == (H * f, W * f):
            from ..ops.resize import resize_nchw
            from .conds import dequantize_hint

            small = resize_nchw(dequantize_hint(leaf),
                                (H // scale * f, W // scale * f), "linear")
            return jnp.concatenate([small] * K, axis=0)
        return jnp.concatenate([leaf] * K, axis=0)

    return _map_cond(c, slice_leaf)


def _dilated_cond(c, views, scale: int, hw: Tuple[int, int]):
    """Per-dilated-view cond batch: canvas leaves subsampled ``[oy::s, ox::s]``
    (ref global_split_bboxes consumes the same strided views, :87-99)."""
    if c is None:
        return None
    H, W = hw
    K = len(views)
    f = LATENT_TO_PIXEL

    def slice_leaf(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (H, W):
            return jnp.concatenate(
                [leaf[:, :, oy::scale, ox::scale] for oy, ox in views], axis=0)
        if leaf.ndim == 4 and leaf.shape[2:] == (H * f, W * f):
            # pixel-space hints (ControlNet): a dilated view sees the whole
            # canvas at 1/scale resolution, so give it the downsampled hint
            # (the sub-latent-pixel view offsets are below hint resolution)
            from ..ops.resize import resize_nchw
            from .conds import dequantize_hint

            small = resize_nchw(dequantize_hint(leaf),
                                (H // scale * f, W // scale * f), "linear")
            return jnp.concatenate([small] * K, axis=0)
        return jnp.concatenate([leaf] * K, axis=0)

    return _map_cond(c, slice_leaf)


def resize_spatial_conds(c, src_hw: Tuple[int, int], dst_hw: Tuple[int, int]):
    """Track the latent canvas across phases: canvas-shaped cond leaves
    (base-resolution inpaint 'concat', hints) resize with it — the analogue
    of A1111 rebuilding image conditioning per phase (ref tileglobal.py's
    per-phase sample_img2img on the upscaled latent)."""
    sh, sw = src_hw
    dh, dw = dst_hw
    if (sh, sw) == (dh, dw):
        return c
    f = LATENT_TO_PIXEL

    def rs(leaf):
        if leaf.ndim == 4 and leaf.shape[2:] == (sh, sw) and leaf.shape[1] > 0:
            return resize_nchw(leaf, (dh, dw), "linear")
        if leaf.ndim == 4 and leaf.shape[2:] == (sh * f, sw * f) and leaf.shape[1] > 0:
            from .conds import dequantize_hint

            return resize_nchw(dequantize_hint(leaf), (dh * f, dw * f), "linear")
        return leaf

    return _map_cond(c, rs)


# ------------------------------------------------------------- denoiser


def _make_sharded_batch_denoise(mesh, guided, bs: int, guided_cached=None):
    """Shard a stacked ``[K, B, ...]`` tile/view batch over the mesh 'tiles'
    axis and denoise per shard in uniform ``bs``-sized chunks.

    Same bitwise-determinism design as schedulers._make_sharded_grid: the
    shard_map returns *denoised tiles* (out_specs sharded) and the caller
    scatters replicated in window/view order, so fusion order matches the
    single-device path; psum would regroup float adds topology-dependently.
    Beyond-reference: the reference has no parallelism at all (SURVEY §2).

    With ``guided_cached``, ``run(..., cache, is_cached)`` threads DeepCache
    feature caches sharded alongside their views — ``cache`` is one uniform
    ``[n_dev * n_local_chunks, mult*bs*B, ...]`` array, in/out specs
    ``P('tiles')``, so every device keeps the cache for exactly its own
    view shard across steps (view->device assignment is static).
    """
    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape["tiles"]

    def run(stk, conds, sigma, cw_w, uw_w, cache=None, is_cached=None):
        K = stk.shape[0]
        Kp = -(-K // n_dev) * n_dev

        def padK(a):
            if Kp == K:
                return a
            return jnp.concatenate(
                [a, jnp.repeat(a[-1:], Kp - K, axis=0)], axis=0)

        stk = padK(stk)
        conds = jax.tree.map(padK, conds)
        specs = jax.tree.map(lambda _: P("tiles"), conds)
        k_local = Kp // n_dev
        B = stk.shape[1]
        tshape = stk.shape[2:]
        stateful = cache is not None

        def body(tl, cl, cache_l=None):
            outs, ncaches = [], []
            for ci, s0 in enumerate(range(0, k_local, bs)):
                k = min(k_local, s0 + bs) - s0
                chunk = tl[s0:s0 + k]
                cc = jax.tree.map(lambda l, a=s0, b=s0 + k: l[a:b], cl)
                # uniform chunk shape: one compiled call site (mandatory when
                # stateful — the stacked cache needs one uniform call shape)
                if k < bs:
                    chunk = jnp.concatenate(
                        [chunk, jnp.repeat(chunk[-1:], bs - k, axis=0)], axis=0)
                    cc = jax.tree.map(
                        lambda l: jnp.concatenate(
                            [l, jnp.repeat(l[-1:], bs - k, axis=0)], axis=0), cc)
                flat = chunk.reshape((bs * B,) + tshape)
                cflat = jax.tree.map(
                    lambda l: l.reshape((bs * l.shape[1],) + l.shape[2:]), cc)
                c = _attach_weights(cflat.get("c"), cw_w)
                u = _attach_weights(cflat.get("u"), uw_w)
                if stateful:
                    out, nc = guided_cached(flat, sigma, c, u,
                                            cache_l[ci], is_cached)
                    ncaches.append(nc)
                else:
                    out = guided(flat, sigma, c, u)
                outs.append(out.reshape((bs, B) + tshape)[:k])
            out = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
            if stateful:
                return out, jnp.stack(ncaches)
            return out

        if stateful:
            out, new_cache = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P("tiles"), specs, P("tiles")),
                out_specs=(P("tiles"), P("tiles")))(stk, conds, cache)
            return out[:K], new_cache

        out = jax.shard_map(body, mesh=mesh,
                            in_specs=(P("tiles"), specs),
                            out_specs=P("tiles"))(stk, conds)
        return out[:K]

    return run


def demofusion_deepcache_aux(pipe, plan: DemoFusionPhasePlan,
                             cfg: DemoFusionConfig, uncond_is_none: bool,
                             cfg_scale: float, n_and: int, branch: int,
                             B: int):
    """Zero-init DeepCache feature caches for the *global dilated-view* leg
    (the jitter-free one — see make_demofusion_denoiser).  Shape layout must
    mirror the path the denoiser engages: mesh-sharded / lax.scan xs /
    unrolled tuple.  Step 0 always runs the full model, so zeros are never
    consumed (same contract as pipeline._deepcache_aux)."""
    mult = (n_and + 1) if n_and else (1 if (uncond_is_none or cfg_scale == 1.0)
                                      else 2)
    ch = pipe.unet.cfg.block_out_channels[branch]
    down = 2 ** (branch - 1)
    nhwc = pipe.unet.layout == "NHWC"
    hs, ws = plan.h // plan.scale, plan.w // plan.scale
    if hs % down or ws % down:
        raise ValueError(
            f"deepcache_branch={branch} needs dilated-view dims divisible "
            f"by {down}, got {hs}x{ws}")
    sh, sw = hs // down, ws // down

    def cshape(n):
        return (n, sh, sw, ch) if nhwc else (n, ch, sh, sw)

    mesh = pipe.mesh
    if mesh is not None and "tiles" in getattr(mesh, "shape", {}):
        n_dev = mesh.shape["tiles"]
        K = len(plan.global_offsets)
        k_local = -(-K // n_dev)
        n_local = -(-k_local // cfg.tile_bs_g)
        return jnp.zeros((n_dev * n_local,)
                         + cshape(mult * cfg.tile_bs_g * B), pipe.unet.dtype)
    if _resolve_df_scan(cfg, plan) and len(plan.global_batches) > 1:
        gbs = max(len(b) for b in plan.global_batches)
        return jnp.zeros((len(plan.global_batches),)
                         + cshape(mult * gbs * B), pipe.unet.dtype)
    return tuple(jnp.zeros(cshape(mult * len(b) * B), pipe.unet.dtype)
                 for b in plan.global_batches)


def make_demofusion_denoiser(
    plan: DemoFusionPhasePlan,
    cfg: DemoFusionConfig,
    guided: Callable,
    cond,
    uncond,
    lat0: jnp.ndarray,
    noise: jnp.ndarray,
    t_enc: int,
    jitter: jnp.ndarray,                # [n_windows, 2] traced offsets
    mesh=None,
    guided_cached=None,
    deepcache: int = 1,
):
    """denoised_fn(x, sigma, step) for one DemoFusion phase.

    ``guided(x, sigma, c, u)`` is the pipeline's CFG'd denoiser
    (DiffusionPipeline._make_guided); ``cond``/``uncond`` may be plain
    pytrees, scheduled banks, or AND compositions.

    With ``mesh`` (a 'tiles'-axis mesh), window and dilated-view batches
    shard over the devices: tiles are gathered replicated (jitter offsets
    are traced), denoised per shard, and fused replicated in window/view
    order — the same deterministic-fusion layout as the tiled grid
    (parallel/sharded.py).  The reference runs everything on one GPU
    (ref tileglobal.py:274-362); this is the v5e-8 scale-out path.

    With ``deepcache > 1`` (and ``guided_cached``), the *global dilated
    views* run DeepCache and the returned fn is stateful:
    ``denoised_fn(x, sigma, step, aux) -> (out, aux)`` with ``aux`` the
    per-view-batch feature caches (``demofusion_deepcache_aux`` builds the
    zeros).  Only the global leg caches: its view geometry is static across
    steps, while the local windows re-jitter every step, so their cached
    deep features would belong to different crops (the reason deepcache was
    previously rejected here wholesale — the jitter-free leg is safe).
    """
    from ..pipeline import DiffusionPipeline

    s = plan.scale
    jr = plan.jitter
    tile = plan.tile
    hw = (plan.h, plan.w)
    cond_f = DiffusionPipeline._as_cond_fn(cond)
    uncond_f = DiffusionPipeline._as_cond_fn(uncond) if uncond is not None else None
    # padded-coord window bases; the traced jitter is added per step
    bases = np.array([[b.y + jr, b.x + jr] for b in plan.windows], np.int32)
    use_mesh = mesh is not None and "tiles" in getattr(mesh, "shape", {})
    scan_windows = (not use_mesh) and _resolve_df_scan(cfg, plan)
    use_cache = deepcache > 1 and guided_cached is not None
    win_denoise = glob_denoise = None
    if use_mesh:
        win_denoise = _make_sharded_batch_denoise(mesh, guided, cfg.tile_bs)
        glob_denoise = _make_sharded_batch_denoise(mesh, guided, cfg.tile_bs_g,
                                                   guided_cached)

    def denoised_body(x, sigma, step, aux=None):
        B, C, H, W = x.shape
        is_cached = ((step % deepcache) != 0) if use_cache else None
        new_aux = None
        cosf = 0.5 * (1.0 + jnp.cos(jnp.pi * (step.astype(jnp.float32) + 1.0) / (t_enc + 1.0)))
        c1 = cosf ** cfg.cosine_scale_1
        x_noisy = lat0 + noise * sigma
        x = x * (1.0 - c1) + x_noisy * c1

        xp = jnp.pad(x, ((0, 0), (0, 0), (jr, jr), (jr, jr)))
        offs = jnp.asarray(bases) + jitter          # [n, 2] traced

        c_step = cond_f(step)
        u_step = uncond_f(step) if uncond_f is not None else None
        c_padded = _pad_spatial(c_step, jr, hw)
        u_padded = _pad_spatial(u_step, jr, hw)

        # ---- local windows: uniform average fusion (ref :251-264)
        buf = jnp.zeros_like(xp)
        cnt = jnp.zeros((1, 1, H + 2 * jr, W + 2 * jr), jnp.float32)
        one = jnp.ones((1, 1, tile, tile), jnp.float32)
        if use_mesh:
            nw = len(plan.windows)
            offs_list = [(offs[i, 0], offs[i, 1]) for i in range(nw)]
            tiles = jnp.stack([
                jax.lax.dynamic_slice(xp, (0, 0, oy, ox), (B, C, tile, tile))
                for oy, ox in offs_list])
            conds = {"c": _window_cond_stacked(c_padded, offs_list, tile, hw, jr),
                     "u": _window_cond_stacked(u_padded, offs_list, tile, hw, jr)}
            out = win_denoise(tiles, conds, sigma,
                              _and_weights(c_step), _and_weights(u_step))
            for k, (oy, ox) in enumerate(offs_list):
                cur = jax.lax.dynamic_slice(buf, (0, 0, oy, ox), (B, C, tile, tile))
                buf = jax.lax.dynamic_update_slice(buf, cur + out[k], (0, 0, oy, ox))
                cc = jax.lax.dynamic_slice(cnt, (0, 0, oy, ox), (1, 1, tile, tile))
                cnt = jax.lax.dynamic_update_slice(cnt, cc + one, (0, 0, oy, ox))
        elif scan_windows and len(plan.window_batches) > 1:
            # ONE UNet body in the HLO: scan over uniform window batches
            # (tail padded with a duplicated, zero-weighted window).  The
            # unrolled scale-3 SDXL program fails AOT compilation on 16 GiB
            # chips; this is the structural fix (ROADMAP r5 #1).
            wbs = max(len(b) for b in plan.window_batches)
            w_idx, w_wm = _pad_batches(plan.window_batches, wbs)

            def win_body(carry, inp):
                buf, cnt = carry
                ids, wk = inp
                woffs = [(offs[ids[k], 0], offs[ids[k], 1]) for k in range(wbs)]
                tiles = jnp.concatenate([
                    jax.lax.dynamic_slice(xp, (0, 0, oy, ox), (B, C, tile, tile))
                    for oy, ox in woffs], axis=0)
                cw = _window_cond(c_padded, woffs, tile, hw, jr)
                uw = _window_cond(u_padded, woffs, tile, hw, jr)
                out = guided(tiles, sigma, cw, uw)
                out = out.reshape(wbs, B, C, tile, tile)
                for k, (oy, ox) in enumerate(woffs):
                    cur = jax.lax.dynamic_slice(buf, (0, 0, oy, ox),
                                                (B, C, tile, tile))
                    buf = jax.lax.dynamic_update_slice(
                        buf, cur + out[k] * wk[k], (0, 0, oy, ox))
                    cc = jax.lax.dynamic_slice(cnt, (0, 0, oy, ox),
                                               (1, 1, tile, tile))
                    cnt = jax.lax.dynamic_update_slice(
                        cnt, cc + one * wk[k], (0, 0, oy, ox))
                return (buf, cnt), None

            (buf, cnt), _ = jax.lax.scan(
                win_body, (buf, cnt), (jnp.asarray(w_idx), jnp.asarray(w_wm)))
        else:
            for idx_batch in plan.window_batches:
                woffs = [(offs[i, 0], offs[i, 1]) for i in idx_batch]
                tiles = jnp.concatenate([
                    jax.lax.dynamic_slice(xp, (0, 0, oy, ox), (B, C, tile, tile))
                    for oy, ox in woffs], axis=0)
                cw = _window_cond(c_padded, woffs, tile, hw, jr)
                uw = _window_cond(u_padded, woffs, tile, hw, jr)
                out = guided(tiles, sigma, cw, uw)
                out = out.reshape(len(idx_batch), B, C, tile, tile)
                for k, (oy, ox) in enumerate(woffs):
                    cur = jax.lax.dynamic_slice(buf, (0, 0, oy, ox), (B, C, tile, tile))
                    buf = jax.lax.dynamic_update_slice(buf, cur + out[k], (0, 0, oy, ox))
                    cc = jax.lax.dynamic_slice(cnt, (0, 0, oy, ox), (1, 1, tile, tile))
                    cnt = jax.lax.dynamic_update_slice(cnt, cc + one, (0, 0, oy, ox))
        cnt = jnp.where(cnt == 0, 1.0, cnt)          # jitter can leave gaps (ref :262)
        x_local = (buf / cnt)[:, :, jr:jr + H, jr:jr + W]

        # ---- global dilated views (ref :266-316)
        std_, mean_ = jnp.std(xp), jnp.mean(xp)
        c3 = 0.99 * cosf ** cfg.cosine_scale_3 + 1e-2
        if cfg.gaussian_filter:
            xg = gaussian_blur_nchw(x, 2 * s - 1, cfg.sigma * c3)
            xg = (xg - jnp.mean(xg)) / jnp.std(xg) * std_ + mean_
        else:
            xg = x

        n_total = len(plan.global_offsets)
        x_global = jnp.zeros_like(x)
        if use_mesh:
            views = []
            for i, (oy, ox) in enumerate(plan.global_offsets):
                # mixture: first half of the doubled offset list unblurred
                # (ref :283-304)
                src = x if (cfg.mixture and i < n_total // 2) else xg
                views.append(src[:, :, oy::s, ox::s])
            gv = jnp.stack(views)
            conds = {"c": _dilated_cond_stacked(c_step, plan.global_offsets, s, hw),
                     "u": _dilated_cond_stacked(u_step, plan.global_offsets, s, hw)}
            if use_cache:
                out, new_aux = glob_denoise(
                    gv, conds, sigma, _and_weights(c_step),
                    _and_weights(u_step), aux, is_cached)
            else:
                out = glob_denoise(gv, conds, sigma,
                                   _and_weights(c_step), _and_weights(u_step))
            for i, (oy, ox) in enumerate(plan.global_offsets):
                x_global = x_global.at[:, :, oy::s, ox::s].add(out[i])
        elif scan_windows and len(plan.global_batches) > 1:
            # scan over dilated-view batches: strided ``oy::s`` views become
            # reshape-and-take (traced offsets can't stride-slice), and the
            # scatter-back is a dynamic-index .add on the reshaped canvas
            gbs = max(len(b) for b in plan.global_batches)
            Hs, Ws = H // s, W // s
            goy = np.zeros((len(plan.global_batches), gbs), np.int32)
            gox = np.zeros((len(plan.global_batches), gbs), np.int32)
            gwm = np.zeros((len(plan.global_batches), gbs), np.float32)
            gpl = np.zeros((len(plan.global_batches), gbs), np.float32)
            seen = 0
            for bi, batch in enumerate(plan.global_batches):
                for k in range(gbs):
                    kk = min(k, len(batch) - 1)
                    goy[bi, k], gox[bi, k] = batch[kk]
                    gwm[bi, k] = 1.0 if k < len(batch) else 0.0
                    # mixture: first half of the doubled offsets unblurred
                    # (ref :283-304)
                    gpl[bi, k] = 1.0 if (cfg.mixture
                                         and (seen + kk) < n_total // 2) else 0.0
                seen += len(batch)
            xr = x.reshape(B, C, Hs, s, Ws, s)
            xgr = xg.reshape(B, C, Hs, s, Ws, s)
            xga_r = x_global.reshape(B, C, Hs, s, Ws, s)

            def glob_body(xga_r, inp):
                if use_cache:
                    oys, oxs, wk, pl, cache_k = inp
                else:
                    oys, oxs, wk, pl = inp
                views = []
                for k in range(gbs):
                    vg = jnp.take(jnp.take(xgr, oys[k], axis=3), oxs[k], axis=4)
                    if cfg.mixture:
                        vp = jnp.take(jnp.take(xr, oys[k], axis=3), oxs[k], axis=4)
                        vg = vp * pl[k] + vg * (1.0 - pl[k])
                    views.append(vg)
                flat = jnp.concatenate(views, axis=0)
                cg = _dilated_cond_dyn(c_step, oys, oxs, gbs, s, hw)
                ug = _dilated_cond_dyn(u_step, oys, oxs, gbs, s, hw)
                if use_cache:
                    # cache rides the scan xs/ys: batch k's cache is consumed
                    # and re-emitted at the same position every step
                    out, ncache = guided_cached(flat, sigma, cg, ug,
                                                cache_k, is_cached)
                else:
                    out, ncache = guided(flat, sigma, cg, ug), None
                out = out.reshape(gbs, B, C, Hs, Ws)
                for k in range(gbs):
                    xga_r = xga_r.at[:, :, :, oys[k], :, oxs[k]].add(out[k] * wk[k])
                return xga_r, ncache

            xs = (jnp.asarray(goy), jnp.asarray(gox),
                  jnp.asarray(gwm), jnp.asarray(gpl))
            if use_cache:
                xs = xs + (aux,)
            xga_r, ys = jax.lax.scan(glob_body, xga_r, xs)
            if use_cache:
                new_aux = ys
            x_global = xga_r.reshape(B, C, H, W)
        else:
            seen = 0
            ncaches = []
            for bi, batch in enumerate(plan.global_batches):
                views = []
                for idx_in_batch, (oy, ox) in enumerate(batch):
                    # mixture mode: first half of the doubled offset list uses the
                    # unblurred input, second half the blurred one (ref :283-304)
                    use_plain = cfg.mixture and (seen + idx_in_batch) < n_total // 2
                    src = x if use_plain else xg
                    views.append(src[:, :, oy::s, ox::s])
                flat = jnp.concatenate(views, axis=0)
                cg = _dilated_cond(c_step, batch, s, hw)
                ug = _dilated_cond(u_step, batch, s, hw)
                if use_cache:
                    out, nc = guided_cached(flat, sigma, cg, ug,
                                            aux[bi], is_cached)
                    ncaches.append(nc)
                else:
                    out = guided(flat, sigma, cg, ug)
                out = out.reshape(len(batch), B, C, out.shape[-2], out.shape[-1])
                for k, (oy, ox) in enumerate(batch):
                    x_global = x_global.at[:, :, oy::s, ox::s].add(out[k])
                seen += len(batch)
            if use_cache:
                new_aux = tuple(ncaches)
        if cfg.mixture:
            x_global = x_global / 2.0

        c2 = cosf ** cfg.cosine_scale_2
        out = x_local * (1.0 - c2) + x_global * c2
        return (out, new_aux) if use_cache else out

    if use_cache:
        return denoised_body          # stateful: (x, sigma, step, aux)

    def denoised_fn(x, sigma, step):
        return denoised_body(x, sigma, step)

    return denoised_fn


def demofusion_generate(
    pipe,
    cond,
    uncond,
    width: int,
    height: int,
    cfg: DemoFusionConfig,
    sampler: Optional[SamplerConfig] = None,
    seed: int = 0,
    init_latent: Optional[jnp.ndarray] = None,
    tiled_vae=None,
    decode: bool = True,
):
    """Multi-phase progressive upscaling driver (ref tileglobal.py:274-362).

    Phase 1 samples (or takes) the base-resolution latent; each subsequent
    phase bicubic-upscales, re-noises via the truncated schedule, runs the
    DemoFusion denoiser, and re-anchors mean/std.  Returns every phase's
    latent (ref emits all intermediate scales, tileglobal.py:240-253).
    Per-phase executables are cached in the pipeline's jit cache (keyed on
    static geometry; jitter is a traced argument), so repeated calls skip
    recompilation.
    """
    from ..pipeline import GenerationResult   # cycle-free at call time

    sp = sampler or SamplerConfig()
    if sp.deepcache > 1:
        # DeepCache runs on the *global dilated-view* leg only: its view
        # geometry is static across steps.  The local windows re-jitter
        # every step, so their cached deep features would belong to
        # different crops — they always run the full model.
        import sys as _sys

        print("[DemoFusion] DeepCache active on the global dilated views "
              "only (windows re-jitter every step and stay uncached)",
              file=_sys.stderr)
    h0, w0 = height // 8, width // 8
    key = jax.random.PRNGKey(seed)

    if init_latent is None:
        base = pipe.txt2img(cond, uncond, width, height, sampler=sp, seed=seed,
                            decode=False)
        latents = base.latents
    else:
        latents = init_latent

    anchor_mean = jnp.mean(latents)
    anchor_std = jnp.std(latents)
    phases = [latents]
    rng = np.random.default_rng(seed)
    strengths = list(cfg.denoise_strengths) or [0.45]

    for phase_i, scale in enumerate(range(2, cfg.scale_factor + 1)):
        if getattr(pipe, "interrupted", False):
            break                      # cooperative interruption between phases
        H, W = h0 * scale, w0 * scale
        lat0 = resize_nchw(latents, (H, W), "cubic")
        plan = plan_demofusion_phase(H, W, scale, cfg)
        jitter = jnp.asarray(draw_jitter(plan, rng))
        c_phase = resize_spatial_conds(cond, (h0, w0), (H, W))
        u_phase = resize_spatial_conds(uncond, (h0, w0), (H, W)) \
            if uncond is not None else None

        strength = strengths[min(phase_i, len(strengths) - 1)]
        steps, t_enc = pipe.schedule.img2img_steps(sp.steps, strength)
        all_sig = jnp.asarray(pipe.schedule.sampling_sigmas(steps, sp.schedule))
        sigmas = all_sig[steps - t_enc - 1:]

        pkey = jax.random.fold_in(key, 100 + scale)
        noise = jax.random.normal(pkey, lat0.shape, lat0.dtype)

        x = lat0 + noise * sigmas[0]
        sampler_fn = get_sampler(sp.name)
        sigmas_const = sigmas          # STATIC_SIGMA_SAMPLERS split host-side

        def builder(plan=plan, t_enc=t_enc, sampler_fn=sampler_fn,
                    sigmas_const=sigmas_const):
            def run(uparams, cnparams, c, u, sigmas, x, lat0, noise, jitter,
                    skey, aux):
                if sp.name in STATIC_SIGMA_SAMPLERS:
                    # Restart/DPM fast/adaptive do host-side schedule math on
                    # np.asarray(sigmas); bake the schedule in as a constant
                    # (jkey carries the sigma tuple so phases don't collide)
                    sigmas = sigmas_const
                # cnparams as a jit argument: _model_fn would otherwise close
                # over self.controlnet_params and bake GBs of ControlNet
                # weights into the HLO as constants (remote-compile killer)
                stateful = sp.deepcache > 1
                guided, _, guided_c = pipe._make_guided(
                    sp.cfg_scale, uparams, cnparams, sp.deepcache_branch)
                # per-step cooperative interruption, same as the tiled pipeline
                den_fn = pipe._interruptible(make_demofusion_denoiser(
                    plan, cfg, guided, c, u, lat0, noise, t_enc, jitter,
                    mesh=pipe.mesh,
                    guided_cached=guided_c if stateful else None,
                    deepcache=sp.deepcache), stateful=stateful)
                kw = {"aux": aux} if stateful else {}
                if sp.name in STOCHASTIC_SAMPLERS:
                    return sampler_fn(den_fn, x, sigmas, skey, **kw)
                return sampler_fn(den_fn, x, sigmas, **kw)

            return run

        skey = jax.random.fold_in(pkey, 1)
        aux = None
        if sp.deepcache > 1:
            n_and = (len(cond["__and__"]) if isinstance(cond, dict)
                     and "__and__" in cond else 0)
            aux = demofusion_deepcache_aux(
                pipe, plan, cfg, uncond is None, sp.cfg_scale, n_and,
                sp.deepcache_branch, int(lat0.shape[0]))
        if pipe._cacheable(cond, uncond):
            jkey = ("demofusion", plan.cache_key(), t_enc, int(sigmas.shape[0]),
                    sp.name, sp.cfg_scale, uncond is None,
                    cfg.cosine_scale_1, cfg.cosine_scale_2, cfg.cosine_scale_3,
                    cfg.sigma, cfg.gaussian_filter, cfg.mixture,
                    _resolve_df_scan(cfg, plan),
                    sp.deepcache, sp.deepcache_branch,
                    None if pipe.mesh is None else tuple(pipe.mesh.shape.items()))
            if sp.name in STATIC_SIGMA_SAMPLERS:
                jkey += (tuple(np.asarray(sigmas_const).tolist()),)
            runner = pipe._cached_jit(jkey, builder)
            latents = runner(pipe.unet_params, pipe.controlnet_params,
                             c_phase, u_phase, sigmas, x,
                             lat0, noise, jitter, skey, aux)
        else:
            run = builder()
            latents = jax.jit(
                lambda up, cp, sg, xx, l0, nz, jt, sk, ax: run(
                    up, cp, c_phase, u_phase, sg, xx, l0, nz, jt, sk, ax)
            )(pipe.unet_params, pipe.controlnet_params, sigmas, x, lat0,
              noise, jitter, skey, aux)

        latents = (latents - jnp.mean(latents)) / jnp.std(latents) * anchor_std + anchor_mean
        phases.append(latents)

    keep = phases if cfg.keep_intermediate else [phases[-1]]
    images = None
    if decode:
        images = [pipe._decode(l, tiled_vae) for l in keep]
    # Full-knob metadata so a DemoFusion run is reproducible from its own
    # PNG info, like tiled-diffusion runs (ref tileglobal.py:28-40 records
    # per-phase sizes and :172-191 rewrites the infotext per emitted scale).
    # config.demofusion_from_png_info() round-trips this block.
    info = {
        "Sampler": sp.name, "Steps": sp.steps, "CFG scale": sp.cfg_scale,
        "Seed": seed,
        "DemoFusion": {
            "Scale factor": cfg.scale_factor,
            "Window size": cfg.window_size,
            "Overlap": cfg.overlap,
            "Tile batch size": cfg.tile_bs,
            "Global batch size": cfg.tile_bs_g,
            "Cosine scale 1": cfg.cosine_scale_1,
            "Cosine scale 2": cfg.cosine_scale_2,
            "Cosine scale 3": cfg.cosine_scale_3,
            "Sigma": cfg.sigma,
            "Random jitter": cfg.random_jitter,
            "Mixture": cfg.mixture,
            "Gaussian filter": cfg.gaussian_filter,
            "Keep intermediate": cfg.keep_intermediate,
            "Denoise strengths": list(cfg.denoise_strengths),
            # pixel sizes of every produced phase (ref tileglobal.py:28-40)
            "Phase sizes": [[int(l.shape[-2]) * 8, int(l.shape[-1]) * 8]
                            for l in phases],
        },
    }
    return GenerationResult(images, keep[-1], seed, info)
