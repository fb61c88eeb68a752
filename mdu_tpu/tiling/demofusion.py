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

Window jitter is drawn host-side per phase (ref computes it once per phase
in get_views, tileglobal.py:322), so all shapes and offsets are static under
jit; only the blur sigma follows a traced cosine schedule.
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
from ..samplers.samplers import STOCHASTIC_SAMPLERS, get_sampler
from ..utils.bbox import BBox
from ..utils.grid import batch_bboxes


@dataclass(frozen=True)
class DemoFusionPhasePlan:
    scale: int
    h: int                       # latent canvas (this phase)
    w: int
    jitter: int
    windows: Tuple[BBox, ...]    # in padded coords
    window_batches: Tuple[Tuple[BBox, ...], ...]
    global_offsets: Tuple[Tuple[int, int], ...]   # (oy, ox), doubled if mixture
    global_batches: Tuple[Tuple[Tuple[int, int], ...], ...]


def plan_demofusion_phase(
    h: int, w: int, scale: int, cfg: DemoFusionConfig, rng: np.random.Generator,
) -> DemoFusionPhasePlan:
    """Jittered window grid (ref demofusion.py:101-138) + dilated global
    offsets (ref :87-99)."""
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
    for r in range(rows):
        for c in range(cols):
            y = min(int(r * dy), h - tile)
            x = min(int(c * dx), w - tile)
            if jitter > 0:
                # interior windows jitter both ways; edge windows only inward
                jx_lo = -jitter if x != 0 else 0
                jx_hi = jitter if x + tile != w else 0
                jy_lo = -jitter if y != 0 else 0
                jy_hi = jitter if y + tile != h else 0
                x += int(rng.integers(jx_lo, jx_hi + 1)) + jitter
                y += int(rng.integers(jy_lo, jy_hi + 1)) + jitter
            windows.append(BBox(x, y, tile, tile))

    offsets = [(oy, ox) for oy in range(scale) for ox in range(scale)]
    if cfg.mixture:
        offsets = offsets + offsets

    return DemoFusionPhasePlan(
        scale=scale, h=h, w=w, jitter=jitter,
        windows=tuple(windows),
        window_batches=tuple(tuple(b) for b in batch_bboxes(windows, cfg.tile_bs)),
        global_offsets=tuple(offsets),
        global_batches=tuple(tuple(b) for b in batch_bboxes(offsets, cfg.tile_bs_g)),
    )


def make_demofusion_denoiser(
    plan: DemoFusionPhasePlan,
    cfg: DemoFusionConfig,
    guided: Callable[[jnp.ndarray, jnp.ndarray, int], jnp.ndarray],
    lat0: jnp.ndarray,
    noise: jnp.ndarray,
    t_enc: int,
):
    """denoised_fn(x, sigma, step) for one DemoFusion phase.

    ``guided(x_views, sigma, n_views)`` is the CFG'd denoiser on a stacked
    view batch (cond repeated per view by the caller).
    """
    s = plan.scale
    jr = plan.jitter

    def denoised_fn(x, sigma, step):
        B, C, H, W = x.shape
        cosf = 0.5 * (1.0 + jnp.cos(jnp.pi * (step.astype(jnp.float32) + 1.0) / (t_enc + 1.0)))
        c1 = cosf ** cfg.cosine_scale_1
        x_noisy = lat0 + noise * sigma
        x = x * (1.0 - c1) + x_noisy * c1

        xp = jnp.pad(x, ((0, 0), (0, 0), (jr, jr), (jr, jr)))

        # ---- local windows: uniform average fusion (ref :251-264)
        buf = jnp.zeros_like(xp)
        cnt = jnp.zeros((1, 1, H + 2 * jr, W + 2 * jr), jnp.float32)
        for bboxes in plan.window_batches:
            tiles = jnp.concatenate(
                [xp[:, :, b.y:b.y + b.h, b.x:b.x + b.w] for b in bboxes], axis=0)
            out = guided(tiles, sigma, len(bboxes))
            out = out.reshape(len(bboxes), B, C, bboxes[0].h, bboxes[0].w)
            for k, b in enumerate(bboxes):
                buf = buf.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(out[k])
                cnt = cnt.at[:, :, b.y:b.y + b.h, b.x:b.x + b.w].add(1.0)
        cnt = jnp.where(cnt == 0, 1.0, cnt)          # jitter can leave gaps (ref :262)
        x_local = (buf / cnt)[:, :, jr:jr + H, jr:jr + W]

        # ---- global dilated views (ref :266-316)
        std_, mean_ = jnp.std(xp), jnp.mean(xp)
        c3 = 0.99 * cosf ** cfg.cosine_scale_3 + 1e-2
        if cfg.gaussian_filter:
            xg = gaussian_blur_nchw(x, 2 * s - 1, cfg.sigma * c3)
            xg = (xg - jnp.mean(xg)) / jnp.std(xg) * std_ + mean_
            xgp = jnp.pad(xg, ((0, 0), (0, 0), (jr, jr), (jr, jr)))
        else:
            xgp = xp

        n_total = len(plan.global_offsets)
        x_global = jnp.zeros_like(x)
        end_h, end_w = H + jr, W + jr
        seen = 0
        for batch in plan.global_batches:
            views = []
            for idx_in_batch, (oy, ox) in enumerate(batch):
                # mixture mode: first half of the doubled offset list uses the
                # unblurred input, second half the blurred one (ref :283-304)
                use_plain = cfg.mixture and (seen + idx_in_batch) < n_total // 2
                src = xp if use_plain else xgp
                views.append(src[:, :, jr + oy:end_h:s, jr + ox:end_w:s])
            flat = jnp.concatenate(views, axis=0)
            out = guided(flat, sigma, len(batch))
            out = out.reshape(len(batch), B, C, out.shape[-2], out.shape[-1])
            for k, (oy, ox) in enumerate(batch):
                x_global = x_global.at[:, :, oy::s, ox::s].add(out[k])
            seen += len(batch)
        if cfg.mixture:
            x_global = x_global / 2.0

        c2 = cosf ** cfg.cosine_scale_2
        return x_local * (1.0 - c2) + x_global * c2

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
    """
    from ..pipeline import GenerationResult   # cycle-free at call time

    sp = sampler or SamplerConfig()
    for c in (cond, uncond):
        if isinstance(c, dict) and ("__bank__" in c or "__and__" in c):
            raise ValueError(
                "DemoFusion currently supports plain cond pytrees "
                "(no prompt scheduling / AND composition)")
        if isinstance(c, dict) and c.get("concat") is not None \
                and getattr(c["concat"], "ndim", 0) == 4 \
                and c["concat"].shape[-1] > 1:
            raise ValueError(
                "DemoFusion does not support spatial image conditioning "
                "(inpaint-model concat) yet — views would need per-window "
                "slicing of the cond leaf")
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
        plan = plan_demofusion_phase(H, W, scale, cfg, rng)

        strength = strengths[min(phase_i, len(strengths) - 1)]
        steps, t_enc = pipe.schedule.img2img_steps(sp.steps, strength)
        all_sig = jnp.asarray(pipe.schedule.sampling_sigmas(steps, sp.schedule))
        sigmas = all_sig[steps - t_enc - 1:]

        pkey = jax.random.fold_in(key, 100 + scale)
        noise = jax.random.normal(pkey, lat0.shape, lat0.dtype)

        x = lat0 + noise * sigmas[0]
        sampler_fn = get_sampler(sp.name)

        def run(uparams, x, lat0, noise):
            guided = _make_view_guided(pipe, cond, uncond, sp.cfg_scale, uparams)
            # per-step cooperative interruption, same as the tiled pipeline
            den_fn = pipe._interruptible(
                make_demofusion_denoiser(plan, cfg, guided, lat0, noise, t_enc))
            if sp.name in STOCHASTIC_SAMPLERS:
                return sampler_fn(den_fn, x, sigmas, jax.random.fold_in(pkey, 1))
            return sampler_fn(den_fn, x, sigmas)

        latents = jax.jit(run)(pipe.unet_params, x, lat0, noise)

        latents = (latents - jnp.mean(latents)) / jnp.std(latents) * anchor_std + anchor_mean
        phases.append(latents)

    keep = phases if cfg.keep_intermediate else [phases[-1]]
    images = None
    if decode:
        images = [pipe._decode(l, tiled_vae) for l in keep]
    return GenerationResult(images, keep[-1], seed,
                            {"DemoFusion": {"Scale factor": cfg.scale_factor,
                                            "Window size": cfg.window_size,
                                            "Overlap": cfg.overlap,
                                            "Mixture": cfg.mixture}})


def _make_view_guided(pipe, cond, uncond, cfg_scale, unet_params=None):
    """CFG'd denoiser over a stacked view batch with repeated conds."""
    from ..samplers.denoiser import cfg_combine, denoised_from_model
    from .conds import concat_conds, tile_cond

    den = denoised_from_model(pipe._model_fn(unet_params), pipe.schedule)

    def rep(c, n):
        return jax.tree.map(lambda l: jnp.concatenate([l] * n, axis=0), c)

    def guided(views, sigma, n_views):
        B = views.shape[0]
        s = jnp.broadcast_to(jnp.atleast_1d(sigma), (B,))
        c = rep(cond, n_views)
        if uncond is None or cfg_scale == 1.0:
            return den(views, s, c)
        u = rep(uncond, n_views)
        x2 = jnp.concatenate([views, views], axis=0)
        d = den(x2, jnp.concatenate([s, s]), concat_conds(u, c))
        du, dc = jnp.split(d, 2, axis=0)
        return cfg_combine(du, dc, cfg_scale)

    return guided
