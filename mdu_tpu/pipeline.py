"""End-to-end generation pipelines: txt2img / img2img with tiled diffusion,
tiled VAE, regional prompts, and tiled noise inversion.

This layer owns what A1111's processing loop provided to the reference
(SURVEY.md L0/L3): latent setup, seeded noise, sampler dispatch, VAE
round-trips, and the orchestration the reference performs in
scripts/tilediffusion.py:257-529 via hijacks — here it is plain composition:

  plan    = plan_tiled_diffusion(...)                       (static geometry)
  den_fn  = make_tiled_denoiser(plan, tile_denoise, ...)    (combinator)
  latent  = sampler(den_fn, noise, sigmas)                  (pure scan)
  image   = tiled_vae_decode(...)

Everything between noise and image is jit-compiled as one program.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
from .models.unet import UNet2DCondition
from .models.vae import AutoencoderKL, sample_from_moments
from .ops.resize import resize_nchw
from .samplers.denoiser import cfg_combine, denoised_from_model, scalings
from .samplers.samplers import (STATIC_SIGMA_SAMPLERS, STOCHASTIC_SAMPLERS,
                                get_sampler)
from .samplers.schedule import NoiseSchedule
from .tiling.conds import (Cond, concat_conds, fit_cond_canvases,
                           quantize_control_hints, tile_cond,
                           tile_cond_stacked)
from .tiling.regions import compose_region_noise, resolve_seed
from .tiling.schedulers import DiffusionTilePlan, make_tiled_denoiser, plan_tiled_diffusion
from .tiling.tiled_vae import tiled_vae_decode, tiled_vae_encode_moments
from .upscale import get_upscaler
from .utils.bbox import BlendMode
from .utils.grid import splitable
from .utils.guided_filter import get_retouch_mask
from .utils.image import grayscale_u8, image_to_tensor, tensor_to_image


def host_callbacks_supported() -> bool:
    """Whether the active backend supports host send/recv callbacks.

    The tunneled TPU plugin ('axon' platform) rejects io_callback /
    pure_callback / jax.debug.callback with UNIMPLEMENTED — per-step
    interruption and step callbacks must be skipped there.  Override with
    MDU_HOST_CALLBACKS=0/1."""
    import os

    v = os.environ.get("MDU_HOST_CALLBACKS")
    if v is not None:
        return v == "1"
    try:
        d = jax.devices()[0]
        # the tunneled plugin reports platform 'tpu' but identifies itself
        # in platform_version ("PJRT C API\naxon 0.1.0; ...")
        ver = getattr(d.client, "platform_version", "") or ""
        return d.platform != "axon" and "axon" not in ver
    except Exception:        # noqa: BLE001
        return True


@dataclass
class NoiseInverseCache:
    """One cached (x0, xt) latent pair (ref utils.py:42,
    abstractdiffusion.py:627-646 — '~16 MB for an 8K image').

    Keyed like the reference (abstractdiffusion.py:628-639): prompt content
    (here a content hash of the cond pytree), model identity (the params
    object the pipeline held when the inversion ran), steps, retouch, and
    closeness of x0."""

    x0: np.ndarray
    xt: np.ndarray
    steps: int
    retouch: float
    prompt_key: str
    params: Any = None           # same object the pipeline holds — no copy

    def matches(self, x0: jnp.ndarray, steps: int, retouch: float,
                prompt_key: str, params: Any = None) -> bool:
        return (
            self.steps == steps
            and abs(self.retouch - retouch) < 0.01
            and self.prompt_key == prompt_key
            and self.params is params
            and self.x0.shape == x0.shape
            and float(np.abs(self.x0 - np.asarray(x0)).sum()) < 100  # ref :635
        )


def cond_fingerprint(cond) -> str:
    """Content hash of a cond pytree (collision-safe replacement for the
    leaf-sum key): sha1 over every leaf's bytes + shape."""
    import hashlib

    h = hashlib.sha1()
    for leaf in jax.tree.leaves(cond):
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


@dataclass
class GenerationResult:
    # uint8 [B, H, W, 3]; DemoFusion with keep_intermediate returns a list
    # of such arrays, one per phase scale (ref tileglobal.py:240-253 emits
    # every intermediate scale as an output batch entry).
    images: Union[np.ndarray, List[np.ndarray], None]
    latents: jnp.ndarray
    seed: int
    info: Dict[str, Any]


class DiffusionPipeline:
    """Stable-Diffusion pipeline over explicit cond pytrees.

    ``cond``/``uncond`` follow tiling/conds.py: {'crossattn', 'concat',
    'vector', 'control'}.  The text layer (mdu_tpu.text) builds them from
    prompt strings; tests pass embeddings directly.
    """

    def __init__(
        self,
        unet: UNet2DCondition,
        unet_params: Any,
        vae: AutoencoderKL,
        vae_params: Any,
        schedule: Optional[NoiseSchedule] = None,
        controlnet=None,
        controlnet_params: Any = None,
        mesh=None,
        guidance_model=None,
        guidance_params: Any = None,
    ):
        self.unet = unet
        self.unet_params = unet_params
        self.vae = vae
        self.vae_params = vae_params
        self.schedule = schedule or NoiseSchedule()
        self.controlnet = controlnet
        self.controlnet_params = controlnet_params
        # StableSR-style latent-image guidance adapter (models/stablesr.py,
        # ref abstractdiffusion.py:547-588): consumes the canvas-shaped
        # cond['guidance'] leaf, which tile_cond slices per tile/region
        self.guidance_model = guidance_model
        self.guidance_params = guidance_params
        # optional jax.sharding.Mesh with a 'tiles' axis: grid-tile denoising
        # shards over it (tile-data-parallelism over ICI, SURVEY.md §2
        # parallelism table); model params stay replicated
        self.mesh = mesh
        if mesh is not None and "tiles" not in mesh.shape:
            raise ValueError("pipeline mesh needs a 'tiles' axis "
                             "(parallel.make_tile_mesh)")
        self.noise_inverse_cache: Optional[NoiseInverseCache] = None
        self.interrupted = False      # cooperative interruption flag
                                      # (ref state.interrupted checks, SURVEY.md §5)
        # the user-supplied step callback is dereferenced at call time through
        # this attribute, so compiled executables never bake a callback object
        # (id()-keyed caching is unsound: CPython reuses ids after GC)
        self._step_cb = None
        # jit-executable cache: keyed by static generation config so repeated
        # calls with new prompts/seeds reuse the compiled program
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------- model fns

    def _model_fn(self, params=None, controlnet_params=None):
        """Raw model fn. ``params``/``controlnet_params`` may be jit
        arguments — closing over weight trees would bake them into the HLO
        as constants (fatal for SD-scale models on the remote-compile TPU
        path)."""
        unet = self.unet
        params = self.unet_params if params is None else params
        is_xl = unet.cfg.addition_embed_type == "text_time"
        controlnet = self.controlnet
        cn_params = (self.controlnet_params if controlnet_params is None
                     else controlnet_params)
        guidance = self.guidance_model
        g_params = self.guidance_params

        def fn(x, t, cond: Cond, cache=None, cache_mode=None, cache_branch=1):
            xin = x
            cc = cond.get("concat")
            if cc is not None and cc.shape[-2:] == x.shape[-2:] and cc.shape[1] > 0:
                xin = jnp.concatenate([x, cc.astype(x.dtype)], axis=1)
            added = None
            if is_xl:
                B = x.shape[0]
                vec = cond.get("vector")
                tids = cond.get("time_ids")
                if tids is None:
                    tids = jnp.ones((B, unet.cfg.num_time_ids), jnp.float32)
                added = {"text_embeds": vec, "time_ids": tids}
            if unet.cfg.adm_in_channels is not None:
                # unclip icond: cond['adm'] [B, adm_dim] CLIP image embedding
                # (ref abstractdiffusion.py:133-141 'c_adm'); tile_cond
                # replicates it per tile like the other vector leaves
                adm = cond.get("adm")
                if adm is None:
                    raise ValueError("unclip-class model needs cond['adm'] "
                                     "(CLIP image embedding, ref "
                                     "abstractdiffusion.py:138-168)")
                added = {**(added or {}), "adm": adm}
            residuals = None
            hints = cond.get("control")
            if controlnet is not None and hints:
                from .tiling.conds import dequantize_hint

                # uint8-resident hint canvases (quantize_control_hints)
                # dequantize per tile here; the /255 fuses into the
                # cond-embedding conv
                residuals = controlnet.apply(
                    cn_params, xin, t, cond["crossattn"],
                    dequantize_hint(hints[0], x.dtype), added)
            g = cond.get("guidance")
            if guidance is not None and g is not None:
                from .models.stablesr import combine_residuals

                if g.shape[0] != x.shape[0] and x.shape[0] % g.shape[0] == 0:
                    g = jnp.repeat(g, x.shape[0] // g.shape[0], axis=0)
                residuals = combine_residuals(
                    residuals, guidance.apply(g_params, g.astype(x.dtype), t))
            return unet.apply(params, xin, t, cond["crossattn"], added,
                              residuals=residuals, cache=cache,
                              cache_mode=cache_mode, cache_branch=cache_branch)

        return fn

    # --------------------------------------------------- denoiser assembly

    @staticmethod
    def _resolve_sampler(sp: Optional[SamplerConfig]) -> SamplerConfig:
        sp = sp or SamplerConfig()
        # A1111 '<name> Karras' naming implies the Karras sigma schedule
        if sp.name.endswith(" Karras") and sp.schedule == "automatic":
            sp = dataclasses.replace(sp, schedule="karras")
        return sp

    @staticmethod
    def _as_cond_fn(c):
        """Conds may be plain pytrees, scheduled banks
        ({'__bank__': tree [S,...], '__index__': [steps]}), or legacy
        step-callables."""
        if c is None:
            return None
        if callable(c):
            return c
        if isinstance(c, dict) and "__and__" in c:
            # resolve each AND branch per step (branches may be scheduled banks)
            fns = [DiffusionPipeline._as_cond_fn(p) for p in c["__and__"]]
            return lambda step, _w=c["__weights__"]: {
                "__and__": [f(step) for f in fns], "__weights__": _w}
        if isinstance(c, dict) and "__bank__" in c:
            bank, idx = c["__bank__"], c["__index__"]
            extra = {k: v for k, v in c.items() if k not in ("__bank__", "__index__")}

            def cond_fn(step):
                v = idx[jnp.clip(step, 0, idx.shape[0] - 1)]
                sel = jax.tree.map(lambda b: b[v][None], bank)
                return {**sel, **extra}

            return cond_fn
        return lambda step, _c=c: _c

    def _make_guided(self, cfg_scale: float, unet_params=None,
                     controlnet_params=None, deepcache_branch: int = 1,
                     image_cfg_scale: Optional[float] = None):
        """Build the CFG'd denoiser core shared by the tiled pipeline and
        DemoFusion: ``guided(x, sigma, c, u, den_=den) -> denoised`` with
        AND-composition, cond batch alignment, and classifier-free guidance
        (the reference's CFGDenoiser responsibilities, SURVEY.md L0).

        ``image_cfg_scale`` enables the edit-model (instruct-pix2pix) 3-way
        guidance the reference supports via its [cond, uncond, uncond] batch
        layout (ref abstractdiffusion.py:17-19, 278-310, 330-427):
        ``den = du + image_cfg*(di - du) + cfg*(dc - di)`` where ``di`` is
        the text-uncond + image 'concat' leg and ``du`` the text-uncond with
        the 'concat' image conditioning zeroed.  At image_cfg=1 this reduces
        exactly to 2-way CFG (both share the di leg).

        Also returns ``guided_cached(x, sigma, c, u, cache, is_cached) ->
        (denoised, cache)`` — the same CFG/AND math over the stateful
        DeepCache denoiser (samplers/denoiser.py)."""
        model_fn = self._model_fn(unet_params, controlnet_params)
        den = denoised_from_model(model_fn, self.schedule)
        from .samplers.denoiser import denoised_from_model_cached

        den_cached = denoised_from_model_cached(model_fn, self.schedule,
                                                deepcache_branch)

        def _align(c, B):
            """Repeat cond leaves so their batch matches x (image batch > 1);
            jnp.repeat keeps tile-major, batch-minor ordering."""
            if c is None:
                return None
            if isinstance(c, dict) and "__and__" in c:
                return {"__and__": [_align(p, B) for p in c["__and__"]],
                        "__weights__": c["__weights__"]}

            def rep(leaf):
                if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] not in (0, B) \
                        and B % leaf.shape[0] == 0:
                    return jnp.repeat(leaf, B // leaf.shape[0], axis=0)
                return leaf

            return jax.tree.map(rep, c)

        def _edit_legs(x, u):
            """Validate + build the du (zeroed image concat) leg for 3-way
            edit-model guidance.  Static trace-time checks: the cond contract
            is shape-resolved here."""
            if not (isinstance(u, dict) and u.get("concat") is not None
                    and u["concat"].ndim == 4 and u["concat"].shape[1] > 0
                    and u["concat"].shape[-2:] == x.shape[-2:]):
                raise ValueError(
                    "image_cfg_scale requires an edit-model image "
                    "conditioning: a latent-shaped 'concat' leaf on the "
                    "uncond (ref abstractdiffusion.py:278-310)")
            return {**u, "concat": jnp.zeros_like(u["concat"])}

        def guided(x, sigma, c, u, den_=den):
            B = x.shape[0]
            c = _align(c, B)
            u = _align(u, B)
            s = jnp.broadcast_to(jnp.atleast_1d(sigma), (B,))
            if image_cfg_scale is not None:
                if isinstance(c, dict) and "__and__" in c:
                    raise ValueError("image_cfg_scale cannot be combined "
                                     "with AND prompt composition")
                if u is None:
                    raise ValueError("image_cfg_scale needs an uncond")
                u0 = _edit_legs(x, u)
                x3 = jnp.concatenate([x, x, x], axis=0)
                s3 = jnp.concatenate([s, s, s])
                d = den_(x3, s3, concat_conds(concat_conds(u0, u), c))
                du, di, dc_ = jnp.split(d, 3, axis=0)
                return du + image_cfg_scale * (di - du) + cfg_scale * (dc_ - di)
            if isinstance(c, dict) and "__and__" in c:
                # composable diffusion (A1111 'AND'): den = den_u +
                # cfg * sum_i w_i (den_i - den_u)
                parts, wts = c["__and__"], c["__weights__"]
                P = len(parts)
                xs = jnp.concatenate([x] * (P + 1), axis=0)
                ss = jnp.concatenate([s] * (P + 1), axis=0)
                cc = parts[0]
                for extra_c in parts[1:]:
                    cc = concat_conds(cc, extra_c)
                cc = concat_conds(cc, u if u is not None else parts[0])
                d = den_(xs, ss, cc)
                dens = jnp.split(d, P + 1, axis=0)
                du = dens[-1] if u is not None else jnp.zeros_like(dens[0])
                out = du
                for dc, wt in zip(dens[:P], wts):
                    out = out + cfg_scale * wt * (dc - du)
                return out
            if u is None or cfg_scale == 1.0:
                return den_(x, s, c)
            x2 = jnp.concatenate([x, x], axis=0)
            d = den_(x2, jnp.concatenate([s, s]), concat_conds(u, c))
            du, dc = jnp.split(d, 2, axis=0)
            return cfg_combine(du, dc, cfg_scale)

        def guided_cached(x, sigma, c, u, cache, is_cached):
            B = x.shape[0]
            c = _align(c, B)
            u = _align(u, B)
            s = jnp.broadcast_to(jnp.atleast_1d(sigma), (B,))
            if image_cfg_scale is not None:
                if isinstance(c, dict) and "__and__" in c:
                    raise ValueError("image_cfg_scale cannot be combined "
                                     "with AND prompt composition")
                if u is None:
                    raise ValueError("image_cfg_scale needs an uncond")
                u0 = _edit_legs(x, u)
                x3 = jnp.concatenate([x, x, x], axis=0)
                s3 = jnp.concatenate([s, s, s])
                d, cache = den_cached(x3, s3,
                                      concat_conds(concat_conds(u0, u), c),
                                      cache, is_cached)
                du, di, dc_ = jnp.split(d, 3, axis=0)
                return (du + image_cfg_scale * (di - du)
                        + cfg_scale * (dc_ - di)), cache
            if isinstance(c, dict) and "__and__" in c:
                parts, wts = c["__and__"], c["__weights__"]
                P = len(parts)
                xs = jnp.concatenate([x] * (P + 1), axis=0)
                ss = jnp.concatenate([s] * (P + 1), axis=0)
                cc = parts[0]
                for extra_c in parts[1:]:
                    cc = concat_conds(cc, extra_c)
                cc = concat_conds(cc, u if u is not None else parts[0])
                d, cache = den_cached(xs, ss, cc, cache, is_cached)
                dens = jnp.split(d, P + 1, axis=0)
                du = dens[-1] if u is not None else jnp.zeros_like(dens[0])
                out = du
                for dc, wt in zip(dens[:P], wts):
                    out = out + cfg_scale * wt * (dc - du)
                return out, cache
            if u is None or cfg_scale == 1.0:
                return den_cached(x, s, c, cache, is_cached)
            x2 = jnp.concatenate([x, x], axis=0)
            d, cache = den_cached(x2, jnp.concatenate([s, s]),
                                  concat_conds(u, c), cache, is_cached)
            du, dc = jnp.split(d, 2, axis=0)
            return cfg_combine(du, dc, cfg_scale), cache

        return guided, den, guided_cached

    def _make_denoised_fn(
        self,
        plan: Optional[DiffusionTilePlan],
        cond,
        uncond,
        cfg_scale: float,
        region_conds: Sequence[Tuple[Any, Any]] = (),
        latent_hw: Optional[Tuple[int, int]] = None,
        unet_params=None,
        region_unet_params: Optional[Sequence[Any]] = None,
        controlnet_params=None,
        deepcache: int = 1,
        deepcache_branch: int = 1,
        image_cfg_scale: Optional[float] = None,
    ):
        guided, den, guided_cached = self._make_guided(
            cfg_scale, unet_params, controlnet_params, deepcache_branch,
            image_cfg_scale)
        dc = deepcache > 1
        cond_f = self._as_cond_fn(cond)
        uncond_f = self._as_cond_fn(uncond)
        region_fs = [(self._as_cond_fn(rc), self._as_cond_fn(ru))
                     for rc, ru in region_conds]
        # per-region LoRA'd weights (ref per-region extra-network activation,
        # multidiffusion.py:180-182): regions with their own params get their
        # own denoiser
        region_dens = []
        for i in range(len(region_conds)):
            rp = region_unet_params[i] if region_unet_params else None
            region_dens.append(
                denoised_from_model(self._model_fn(rp), self.schedule)
                if rp is not None else den)

        if plan is None:
            if dc:

                def denoised_fn_c(x, sigma, step, aux):
                    u = uncond_f(step) if uncond_f is not None else None
                    return guided_cached(x, sigma, cond_f(step), u, aux,
                                         (step % deepcache) != 0)

                return self._interruptible(denoised_fn_c, stateful=True)

            def denoised_fn(x, sigma, step):
                u = uncond_f(step) if uncond_f is not None else None
                return guided(x, sigma, cond_f(step), u)

            return self._interruptible(denoised_fn)

        hw = (plan.h, plan.w)

        def tile_denoise(flat, sigma, step, bboxes, batch_i):
            c = tile_cond(cond_f(step), bboxes, hw)
            u = tile_cond(uncond_f(step), bboxes, hw) if uncond_f is not None else None
            return guided(flat, sigma, c, u)

        def tile_denoise_c(flat, sigma, step, bboxes, batch_i, cache):
            c = tile_cond(cond_f(step), bboxes, hw)
            u = tile_cond(uncond_f(step), bboxes, hw) if uncond_f is not None else None
            return guided_cached(flat, sigma, c, u, cache,
                                 (step % deepcache) != 0)

        def region_denoise(xt, sigma, step, i):
            rcf, ruf = region_fs[i]
            c = tile_cond(rcf(step), [plan.regions[i]], hw)
            u = tile_cond(ruf(step), [plan.regions[i]], hw) if ruf is not None else None
            return guided(xt, sigma, c, u, region_dens[i])

        def org_fn(x, sigma, step):
            u = uncond_f(step) if uncond_f is not None else None
            return guided(x, sigma, cond_f(step), u)

        # flat-denoiser contract, used by BOTH the mesh-sharded grid and the
        # lax.scan grid: CFG/AND/scheduled conds are sliced per tile up front
        # (stacked on a leading tile axis, sharded or scanned with the
        # tiles); static AND weights re-attach inside
        cw = (cond["__weights__"]
              if isinstance(cond, dict) and "__and__" in cond else None)
        uw = (uncond["__weights__"]
              if isinstance(uncond, dict) and "__and__" in uncond else None)

        def conds_fn(step):
            c = tile_cond_stacked(cond_f(step), plan.bboxes, hw)
            u = (tile_cond_stacked(uncond_f(step), plan.bboxes, hw)
                 if uncond_f is not None else None)
            return {"c": c, "u": u}

        def sharded_td(flat, sigma, step, conds):
            c, u = conds["c"], conds["u"]
            if cw is not None:
                c = {**c, "__weights__": cw}
            if uw is not None and u is not None:
                u = {**u, "__weights__": uw}
            return guided(flat, sigma, c, u)

        def sharded_td_c(flat, sigma, step, conds, cache):
            c, u = conds["c"], conds["u"]
            if cw is not None:
                c = {**c, "__weights__": cw}
            if uw is not None and u is not None:
                u = {**u, "__weights__": uw}
            return guided_cached(flat, sigma, c, u, cache,
                                 (step % deepcache) != 0)

        if dc:
            return self._interruptible(make_tiled_denoiser(
                plan, tile_denoise_c,
                region_denoise if plan.regions else None, org_fn,
                mesh=self.mesh,
                sharded_tile_denoise=sharded_td_c, tile_conds_fn=conds_fn,
                stateful=True), stateful=True)

        return self._interruptible(make_tiled_denoiser(
            plan, tile_denoise,
            region_denoise if plan.regions else None, org_fn,
            mesh=self.mesh, sharded_tile_denoise=sharded_td,
            tile_conds_fn=conds_fn))

    def _deepcache_aux(self, plan, cond, uncond, cfg_scale: float,
                       branch: int, B: int, hw: Tuple[int, int],
                       image_cfg_scale: Optional[float] = None):
        """Zero-initialized DeepCache feature caches (sampler ``aux``).

        One cache array per UNet call site: [mult*K*B, C_b, h', w'] where
        ``mult`` is the CFG batch multiple (2, P+1 under AND, or 3 under
        edit-model image CFG), ``C_b`` the channel width entering the branch
        point, and (h', w') the tile spatial at level ``branch-1``.  Step 0
        always runs the full model (step % interval == 0), so zeros are
        never consumed."""
        if image_cfg_scale is not None:
            mult = 3
        elif isinstance(cond, dict) and "__and__" in cond:
            mult = len(cond["__and__"]) + 1
        else:
            mult = 1 if (uncond is None or cfg_scale == 1.0) else 2
        ch = self.unet.cfg.block_out_channels[branch]
        down = 2 ** (branch - 1)
        nhwc = self.unet.layout == "NHWC"

        def cshape(n, hh, ww):
            if hh % down or ww % down:
                raise ValueError(
                    f"deepcache_branch={branch} needs tile dims divisible by "
                    f"{down}, got {hh}x{ww}")
            sh, sw = hh // down, ww // down
            return (n, sh, sw, ch) if nhwc else (n, ch, sh, sw)

        if plan is None or not plan.draw_background:
            return jnp.zeros(cshape(mult * B, *hw), self.unet.dtype) \
                if plan is None else ()
        if self.mesh is not None and len(plan.bboxes) > 0:
            # mesh-sharded grid: caches ride the 'tiles' shard with their
            # tiles — one uniform array, device-major chunk order, every
            # chunk padded to tile_bs (schedulers._make_sharded_grid)
            n_dev = self.mesh.shape["tiles"]
            T = len(plan.bboxes)
            t_local = -(-T // n_dev)
            n_local = -(-t_local // plan.tile_bs)
            return jnp.zeros(
                (n_dev * n_local,) + cshape(mult * plan.tile_bs * B,
                                            plan.tile_h, plan.tile_w),
                self.unet.dtype)
        if plan.scan_tiles and len(plan.batched) > 1:
            # lax.scan grid: every chunk is padded to exactly tile_bs, so the
            # caches stack into one uniform [n_chunks, ...] scan input
            n_chunks = len(plan.batched)
            return jnp.zeros(
                (n_chunks,) + cshape(mult * plan.tile_bs * B,
                                     plan.tile_h, plan.tile_w),
                self.unet.dtype)
        caches = []
        for bb in plan.batched:
            Kp = plan.tile_bs if plan.uniform_batches else len(bb)
            caches.append(jnp.zeros(
                cshape(mult * Kp * B, plan.tile_h, plan.tile_w),
                self.unet.dtype))
        return tuple(caches)

    def _interruptible(self, fn, stateful: bool = False):
        """Per-step cooperative interruption *inside* jit: an io_callback
        reads the host flag each sampler step and a lax.cond skips the whole
        denoise (x passes through unchanged), so an interrupted run stops
        paying UNet FLOPs immediately (ref checks shared.state.interrupted
        before every UNet call).  Callers clear ``pipe.interrupted``
        themselves before reusing the pipeline.

        Backends without host send/recv (the tunneled axon PJRT plugin
        rejects io_callback/pure_callback/debug.callback) run uninterrupted;
        DemoFusion still honors the flag between phases."""
        if not host_callbacks_supported():
            return fn
        from jax.experimental import io_callback

        def _read_flag():
            return np.bool_(self.interrupted)

        if stateful:
            def wrapped_s(x, sigma, step, aux):
                flag = io_callback(_read_flag, jax.ShapeDtypeStruct((), jnp.bool_))
                return jax.lax.cond(flag,
                                    lambda op: (op[0], op[3]),
                                    lambda op: fn(*op),
                                    (x, sigma, step, aux))

            return wrapped_s

        def wrapped(x, sigma, step):
            flag = io_callback(_read_flag, jax.ShapeDtypeStruct((), jnp.bool_))
            return jax.lax.cond(flag,
                                lambda op: op[0],
                                lambda op: fn(*op),
                                (x, sigma, step))

        return wrapped

    def _notify_step(self, i, x):
        """Stable host-side trampoline baked into compiled programs in place
        of the user's step_callback (which may change between calls)."""
        cb = self._step_cb
        if cb is not None:
            cb(int(i), x)

    def _cached_jit(self, key, builder):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(builder())
            self._jit_cache[key] = fn
        return fn

    @staticmethod
    def _cacheable(*conds) -> bool:
        return not any(callable(c) for c in conds)

    def _plan(self, td: Optional[TiledDiffusionConfig], h: int, w: int):
        if td is None or not td.enabled:
            return None
        if not (splitable(w, h, td.tile_w, td.tile_h, td.overlap) or td.regions
                or td.noise_inverse):
            return None  # ref tilediffusion.py:309-317: nothing to tile
        return plan_tiled_diffusion(
            td.method, h, w, tile_h=td.tile_h, tile_w=td.tile_w,
            overlap=td.overlap, tile_bs=td.tile_bs,
            regions=td.regions, draw_background=td.draw_background,
            uniform_batches=td.deterministic, tile_scan=td.tile_scan)

    # --------------------------------------------------------------- txt2img

    def txt2img(
        self,
        cond: Cond,
        uncond: Optional[Cond],
        width: int = 512,
        height: int = 512,
        sampler: Optional[SamplerConfig] = None,
        seed: int = 0,
        tiled_diffusion: Optional[TiledDiffusionConfig] = None,
        tiled_vae: Optional[TiledVAEConfig] = None,
        region_conds: Sequence[Tuple[Cond, Optional[Cond]]] = (),
        region_unet_params: Optional[Sequence[Any]] = None,
        batch_size: int = 1,
        decode: bool = True,
        step_callback=None,
    ) -> GenerationResult:
        sp = self._resolve_sampler(sampler)
        h, w = height // 8, width // 8
        plan = self._plan(tiled_diffusion, h, w)
        cond = quantize_control_hints(fit_cond_canvases(cond, (h, w)))
        uncond = quantize_control_hints(fit_cond_canvases(uncond, (h, w)))
        region_conds = [(quantize_control_hints(rc), quantize_control_hints(ru))
                        for rc, ru in region_conds]

        key = jax.random.PRNGKey(seed)
        # A1111 semantics: batch element i uses seed+i for its own noise
        noise = jnp.concatenate([
            jax.random.normal(jax.random.PRNGKey(seed + i),
                              (1, self.unet.cfg.out_channels, h, w), jnp.float32)
            for i in range(batch_size)], axis=0)
        region_seeds = None
        if plan is not None and plan.regions:
            region_seeds = [resolve_seed(r.seed, jax.random.fold_in(key, 1000 + i))
                            for i, r in enumerate(plan.regions)]
            noise = compose_region_noise(noise, plan.regions, region_seeds)

        sigmas = jnp.asarray(self.schedule.sampling_sigmas(sp.steps, sp.schedule))
        sampler_fn = get_sampler(sp.name)
        x = noise * sigmas[0]
        skey = jax.random.fold_in(key, 7)
        self._step_cb = step_callback
        cb = self._notify_step if step_callback is not None else None
        if cb is not None and not host_callbacks_supported():
            print("[Tiled Diffusion] step callbacks unsupported on this "
                  "backend (no host send/recv); ignoring",
                  file=__import__('sys').stderr)
            cb = None

        sigmas_const = sigmas          # STATIC_SIGMA_SAMPLERS split host-side

        def builder():
            def run(uparams, rparams, cnparams, c, u, rc, sigmas, x, skey):
                if sp.name in STATIC_SIGMA_SAMPLERS:
                    sigmas = sigmas_const
                den_fn = self._make_denoised_fn(plan, c, u, sp.cfg_scale,
                                                rc, latent_hw=(h, w),
                                                unet_params=uparams,
                                                region_unet_params=rparams,
                                                controlnet_params=cnparams,
                                                deepcache=sp.deepcache,
                                                deepcache_branch=sp.deepcache_branch,
                                                image_cfg_scale=sp.image_cfg_scale)
                kw = {"step_callback": cb}
                if sp.deepcache > 1:
                    kw["aux"] = self._deepcache_aux(
                        plan, c, u, sp.cfg_scale, sp.deepcache_branch,
                        x.shape[0], (h, w), sp.image_cfg_scale)
                if sp.s_churn > 0 and sp.name in ("Euler", "Heun", "DPM2"):
                    kw.update(s_churn=sp.s_churn, s_tmin=sp.s_tmin,
                              s_tmax=sp.s_tmax, s_noise=sp.s_noise)
                    return sampler_fn(den_fn, x, sigmas, skey, **kw)
                if sp.name in STOCHASTIC_SAMPLERS:
                    return sampler_fn(den_fn, x, sigmas, skey, **kw)
                return sampler_fn(den_fn, x, sigmas, **kw)

            return run

        rparams = tuple(region_unet_params or ()) or None
        if self._cacheable(cond, uncond, *(c for p in region_conds for c in p)):
            jkey = ("txt2img", plan.cache_key() if plan else (h, w), sp.name,
                    sp.cfg_scale, (sp.s_churn, sp.s_tmin, sp.s_tmax, sp.s_noise),
                    uncond is None, len(region_conds),
                    step_callback is not None,
                    (sp.deepcache, sp.deepcache_branch),
                    sp.image_cfg_scale)
            if sp.name in STATIC_SIGMA_SAMPLERS:
                jkey += (tuple(np.asarray(sigmas_const).tolist()),)
            runner = self._cached_jit(jkey, builder)
            latents = runner(self.unet_params, rparams, self.controlnet_params,
                             cond, uncond, tuple(region_conds), sigmas, x, skey)
        else:
            # legacy callable conds cannot cross the jit boundary: bake them in
            run = builder()
            latents = jax.jit(
                lambda up, rp, cp, sg, xx, sk: run(up, rp, cp, cond, uncond,
                                                   tuple(region_conds), sg, xx, sk)
            )(self.unet_params, rparams, self.controlnet_params, sigmas, x, skey)
        images = self._decode(latents, tiled_vae) if decode else None
        info = self._info(sp, tiled_diffusion, seed, region_seeds)
        return GenerationResult(images, latents, seed, info)

    # --------------------------------------------------------------- img2img

    def img2img(
        self,
        image: Optional[np.ndarray],
        cond: Cond,
        uncond: Optional[Cond],
        sampler: Optional[SamplerConfig] = None,
        seed: int = 0,
        tiled_diffusion: Optional[TiledDiffusionConfig] = None,
        tiled_vae: Optional[TiledVAEConfig] = None,
        region_conds: Sequence[Tuple[Cond, Optional[Cond]]] = (),
        region_unet_params: Optional[Sequence[Any]] = None,
        inversion_cond: Optional[Cond] = None,
        mask: Optional[np.ndarray] = None,
        init_latents: Optional[jnp.ndarray] = None,
        decode: bool = True,
        step_callback=None,
        target_size: Optional[Tuple[int, int]] = None,
    ) -> GenerationResult:
        sp = self._resolve_sampler(sampler)
        td = tiled_diffusion
        if td is not None and td.noise_inverse and sp.name != "Euler":
            # the reference forces Euler under noise inversion — other
            # samplers' noise/history mixes poorly with the inverted-noise
            # trajectory (ref tilediffusion.py:431-435)
            print(f"[Tiled Diffusion] noise inversion: overriding sampler "
                  f"{sp.name!r} -> 'Euler' (ref convention)",
                  file=__import__('sys').stderr)
            sp = dataclasses.replace(sp, name="Euler")
        key = jax.random.PRNGKey(seed)

        if init_latents is not None:
            # latent-space entry (pipeline chaining, e.g. base -> refiner);
            # noise inversion's renoise mask needs pixels, so it's image-only
            init_latent = init_latents
            h, w = init_latent.shape[-2], init_latent.shape[-1]
            x_img = None
            if td is not None and td.noise_inverse:
                raise ValueError("noise_inverse requires an image input "
                                 "(the renoise mask is pixel-space)")
        else:
            x_img = image_to_tensor(image) if isinstance(image, np.ndarray) else image
            if td is not None and td.upscaler and td.upscaler != "None":
                x_img = get_upscaler(td.upscaler)(x_img, td.scale_factor)
            if target_size is not None:
                # explicit canvas override — the reference's
                # keep_input_size=False path resizes the (upscaled) init to
                # scale_factor x the original request instead of keeping the
                # upscaler's output size (ref tilediffusion.py:299-304 plus
                # A1111's init resize); default (None) keeps the input size,
                # the reference's default checkbox state (ref :112)
                th, tw = int(target_size[0]), int(target_size[1])
                if (x_img.shape[-2], x_img.shape[-1]) != (th, tw):
                    x_img = resize_nchw(x_img, (th, tw), "lanczos")

            H, W = x_img.shape[-2], x_img.shape[-1]
            h, w = H // 8, W // 8
            x_img = x_img[:, :, :h * 8, :w * 8]

            moments = self._encode(x_img, tiled_vae)
            init_latent = sample_from_moments(moments, jax.random.fold_in(key, 3))
            init_latent = init_latent * self.vae.cfg.scaling_factor

            if sp.image_cfg_scale is not None:
                # edit-model (instruct-pix2pix) image conditioning: the
                # distribution MODE of the post-upscale init image (no
                # scaling_factor, no noise — diffusers ip2p convention; ref
                # abstractdiffusion.py:278-310) rides as the 'concat' leaf
                # on cond AND uncond so its canvas matches the generation
                # latent.  Callers that pre-attached their own 'concat'
                # (explicit edit workflows) are left untouched.
                icond = moments[:, : moments.shape[1] // 2]
                if self.unet.cfg.in_channels < (init_latent.shape[1]
                                                + icond.shape[1]):
                    raise ValueError(
                        "image_cfg_scale needs an edit-model (instruct-"
                        "pix2pix) UNet that accepts the image 'concat' "
                        f"channels: in_channels="
                        f"{self.unet.cfg.in_channels} < "
                        f"{init_latent.shape[1]} latent + "
                        f"{icond.shape[1]} image channels")
                if isinstance(cond, dict) and cond.get("concat") is None \
                        and "__and__" not in cond:
                    cond = {**cond, "concat": icond}
                if isinstance(uncond, dict) and uncond.get("concat") is None \
                        and "__and__" not in uncond:
                    uncond = {**uncond, "concat": icond}

        plan = self._plan(td, h, w)
        cond = quantize_control_hints(fit_cond_canvases(cond, (h, w)))
        uncond = quantize_control_hints(fit_cond_canvases(uncond, (h, w)))
        region_conds = [(quantize_control_hints(rc), quantize_control_hints(ru))
                        for rc, ru in region_conds]
        noise = jax.random.normal(key, init_latent.shape, jnp.float32)
        region_seeds = None
        if plan is not None and plan.regions:
            region_seeds = [resolve_seed(r.seed, jax.random.fold_in(key, 1000 + i))
                            for i, r in enumerate(plan.regions)]
            noise = compose_region_noise(noise, plan.regions, region_seeds)

        # truncated schedule (A1111 setup_img2img_steps)
        steps, t_enc = self.schedule.img2img_steps(sp.steps, sp.denoising_strength)
        all_sigmas = jnp.asarray(self.schedule.sampling_sigmas(steps, sp.schedule))
        sigmas = all_sigmas[steps - t_enc - 1:]

        if td is not None and td.noise_inverse:
            # sigma0 is the FULL schedule's sigma_max — the reference derives
            # inverse_noise = latent - init/sigmas[0] from the untruncated
            # schedule (abstractdiffusion.py:651), which at denoising_strength
            # < 1 retains an init*(1 - sig_sched0/sigma_max) component
            noise = self._noise_inverse_combined_noise(
                x_img, init_latent, noise, td, plan,
                inversion_cond if inversion_cond is not None else cond,
                sigma0=all_sigmas[0])

        sampler_fn = get_sampler(sp.name)
        x = init_latent + noise * sigmas[0]
        skey = jax.random.fold_in(key, 7)
        self._step_cb = step_callback
        cb = self._notify_step if step_callback is not None else None
        if cb is not None and not host_callbacks_supported():
            print("[Tiled Diffusion] step callbacks unsupported on this "
                  "backend (no host send/recv); ignoring",
                  file=__import__('sys').stderr)
            cb = None

        # inpainting latent mask (A1111 masked redraw semantics): blend the
        # denoised estimate with the original latent each step
        latent_mask = None
        if mask is not None:
            m = jnp.asarray(np.asarray(mask), jnp.float32)
            if m.ndim == 2:
                m = m[None, None]
            latent_mask = resize_nchw(m, (h, w), "linear")

        sigmas_const = sigmas          # STATIC_SIGMA_SAMPLERS split host-side

        def builder():
            def run(uparams, rparams, cnparams, c, u, rc, sigmas, x, skey, init_mask):
                if sp.name in STATIC_SIGMA_SAMPLERS:
                    sigmas = sigmas_const
                den_fn = self._make_denoised_fn(plan, c, u, sp.cfg_scale,
                                                rc, latent_hw=(h, w),
                                                unet_params=uparams,
                                                region_unet_params=rparams,
                                                controlnet_params=cnparams,
                                                deepcache=sp.deepcache,
                                                deepcache_branch=sp.deepcache_branch,
                                                image_cfg_scale=sp.image_cfg_scale)
                if init_mask is not None:
                    init_lat, lm = init_mask
                    inner = den_fn
                    if sp.deepcache > 1:
                        def den_fn(xx, ss, ii, aux):  # noqa: F811
                            out, aux = inner(xx, ss, ii, aux)
                            return init_lat * (1 - lm) + out * lm, aux
                    else:
                        def den_fn(xx, ss, ii):  # noqa: F811
                            return init_lat * (1 - lm) + inner(xx, ss, ii) * lm

                kw = {"step_callback": cb}
                if sp.deepcache > 1:
                    kw["aux"] = self._deepcache_aux(
                        plan, c, u, sp.cfg_scale, sp.deepcache_branch,
                        x.shape[0], (h, w), sp.image_cfg_scale)
                if sp.s_churn > 0 and sp.name in ("Euler", "Heun", "DPM2"):
                    kw.update(s_churn=sp.s_churn, s_tmin=sp.s_tmin,
                              s_tmax=sp.s_tmax, s_noise=sp.s_noise)
                    return sampler_fn(den_fn, x, sigmas, skey, **kw)
                if sp.name in STOCHASTIC_SAMPLERS:
                    return sampler_fn(den_fn, x, sigmas, skey, **kw)
                return sampler_fn(den_fn, x, sigmas, **kw)

            return run

        rparams = tuple(region_unet_params or ()) or None
        if self._cacheable(cond, uncond, *(c for p in region_conds for c in p)):
            jkey = ("img2img", plan.cache_key() if plan else (h, w), sp.name,
                    sp.cfg_scale, (sp.s_churn, sp.s_tmin, sp.s_tmax, sp.s_noise),
                    uncond is None, len(region_conds),
                    latent_mask is not None,
                    step_callback is not None,
                    (sp.deepcache, sp.deepcache_branch),
                    sp.image_cfg_scale)
            if sp.name in STATIC_SIGMA_SAMPLERS:
                jkey += (tuple(np.asarray(sigmas_const).tolist()),)
            runner = self._cached_jit(jkey, builder)
            latents = runner(self.unet_params, rparams, self.controlnet_params,
                             cond, uncond, tuple(region_conds), sigmas, x, skey,
                             None if latent_mask is None else (init_latent, latent_mask))
        else:
            # legacy callable conds cannot cross the jit boundary: bake them in
            run = builder()
            latents = jax.jit(
                lambda up, rp, cp, sg, xx, sk, im: run(up, rp, cp, cond, uncond,
                                                       tuple(region_conds), sg, xx, sk, im)
            )(self.unet_params, rparams, self.controlnet_params, sigmas, x, skey,
              None if latent_mask is None else (init_latent, latent_mask))
        images = self._decode(latents, tiled_vae) if decode else None
        info = self._info(sp, td, seed, region_seeds)
        if target_size is not None:
            # ref records 'Keep input size' when keeping (tilediffusion.py:336);
            # we keep by default, so record only the override
            info["Target size"] = [int(target_size[0]), int(target_size[1])]
        return GenerationResult(images, latents, seed, info)

    # ------------------------------------------------------- noise inversion

    def _noise_inverse_combined_noise(
        self, x_img, init_latent, noise, td: TiledDiffusionConfig,
        plan: Optional[DiffusionTilePlan], inv_cond: Cond, sigma0,
    ) -> jnp.ndarray:
        """ref abstractdiffusion.py:604-679: invert init latent to noise,
        blend with fresh noise through the guided-filter renoise mask."""
        prompt_key = cond_fingerprint(inv_cond)
        cache = self.noise_inverse_cache
        if cache is not None and cache.matches(init_latent, td.noise_inverse_steps,
                                               td.noise_inverse_retouch, prompt_key,
                                               self.unet_params):
            xt = jnp.asarray(cache.xt)
        else:
            xt = self.noise_inversion(init_latent, inv_cond, td.noise_inverse_steps,
                                      td.noise_inverse_retouch, plan)
            self.noise_inverse_cache = NoiseInverseCache(
                np.asarray(init_latent), np.asarray(xt), td.noise_inverse_steps,
                td.noise_inverse_retouch, prompt_key, self.unet_params)

        inverse_noise = xt - init_latent / sigma0

        if td.noise_inverse_renoise_strength <= 0:
            return inverse_noise

        gray = grayscale_u8(
            tensor_to_image(np.asarray(x_img))[0])
        detail = get_retouch_mask(gray, td.noise_inverse_renoise_kernel)
        m = 1.0 - resize_nchw(jnp.asarray(detail)[None, None],
                              noise.shape[-2:], "linear")
        m = jnp.clip(m * td.noise_inverse_renoise_strength, 0.0, 1.0)

        if plan is not None and not plan.draw_background and plan.regions:
            # regional reweighting (ref :655-673)
            H, W = noise.shape[-2:]
            bg_cnt = jnp.zeros((1, 1, H, W))
            fg = jnp.zeros_like(noise)
            fg_w = jnp.zeros((1, 1, H, W))
            fg_cnt = jnp.zeros((1, 1, H, W))
            from .utils.weights import feather_mask as _fm
            for r in plan.regions:
                sl = (slice(None), slice(None), slice(r.y, r.y + r.h), slice(r.x, r.x + r.w))
                if r.blend_mode == BlendMode.BACKGROUND:
                    bg_cnt = bg_cnt.at[sl].add(1.0)
                else:
                    fg = fg.at[sl].add(noise[sl])
                    fg_w = fg_w.at[sl].add(jnp.asarray(_fm(r.w, r.h, r.feather_ratio))[None, None])
                    fg_cnt = fg_cnt.at[sl].add(1.0)
            bg_noise = jnp.where(bg_cnt > 0, noise, 0.0)
            fg = jnp.where(fg_cnt > 0, fg / fg_cnt, 0.0)
            fg_w = jnp.where(fg_cnt > 0, fg_w / fg_cnt, 0.0)
            noise = bg_noise * (1 - fg_w) + fg * fg_w

        return ((1 - m) * inverse_noise + m * noise) / jnp.sqrt(m**2 + (1 - m)**2)

    def noise_inversion(
        self,
        init_latent: jnp.ndarray,
        cond: Cond,
        steps: int,
        retouch: float = 1.0,
        plan: Optional[DiffusionTilePlan] = None,
    ) -> jnp.ndarray:
        """Tiled reverse-Euler inversion (ref find_noise_for_image_sigma_adjustment,
        abstractdiffusion.py:683-742; per-tile model fn ref
        multidiffusion.py:220-243).  Uses the positive cond only, no CFG."""
        sch = self.schedule

        # ascending sigmas [sigma_min..sigma_max]; ref flips get_sigmas(steps)
        sig_desc = sch.sampling_sigmas(steps, "automatic")[:-1]     # drop 0
        sig_asc = jnp.asarray(sig_desc[::-1].copy())                # [steps]
        prev = jnp.concatenate([jnp.zeros((1,)), sig_asc[:-1]])
        steps_arr = jnp.arange(steps)

        def run(uparams, cond, x):
            # f32 carry: sigma arithmetic promotes to f32, and a bf16
            # init_latent would make the scan carry dtype-unstable
            x = x.astype(jnp.float32)
            model_fn = self._model_fn(uparams)

            def eps_tile(flat, sigma, step, bboxes, batch_i):
                c = tile_cond(cond, bboxes, (plan.h, plan.w))
                return self._raw_eps(model_fn, flat, sigma, c, retouch)

            def eps_region(xt, sigma, step, i):
                c = tile_cond(cond, [plan.regions[i]], (plan.h, plan.w))
                return self._raw_eps(model_fn, xt, sigma, c, retouch)

            def eps_org(x, sigma, step):
                return self._raw_eps(model_fn, x, sigma, cond, retouch)

            sharded_eps = conds_fn = None
            if plan is not None:
                def conds_fn(step):
                    return tile_cond_stacked(cond, plan.bboxes, (plan.h, plan.w))

                def sharded_eps(flat, sigma, step, c):
                    return self._raw_eps(model_fn, flat, sigma, c, retouch)

            if plan is not None:
                tiled_eps = make_tiled_denoiser(plan, eps_tile,
                                                eps_region if plan.regions else None,
                                                eps_org,
                                                mesh=self.mesh,
                                                sharded_tile_denoise=sharded_eps,
                                                tile_conds_fn=conds_fn)
            else:
                tiled_eps = eps_org

            def body(x, inp):
                i, s, s_prev = inp
                _, c_out, c_in = scalings(s, sch.prediction_type)
                eps = tiled_eps(x * c_in, s, steps - 1 - i)
                denoised = x + eps * c_out        # ref :726 (eps-form even for v)
                d = (x - denoised) / s
                dt = s - s_prev
                return x + d * dt, None

            out, _ = jax.lax.scan(body, x, (steps_arr, sig_asc, prev))
            return out / sig_asc[-1]

        jkey = ("noise_inv", plan.cache_key() if plan else None, steps, retouch)
        runner = self._cached_jit(jkey, lambda: run)
        return runner(self.unet_params, cond, init_latent)

    def _raw_eps(self, model_fn, x, sigma, cond, retouch):
        t = self.schedule.t_for_sigma(jnp.atleast_1d(sigma)) / retouch
        B = x.shape[0]
        t_b = jnp.broadcast_to(t, (B,))
        return model_fn(x, t_b, cond)

    # ------------------------------------------------------------------- VAE

    def _decode(self, latents: jnp.ndarray, tv: Optional[TiledVAEConfig]) -> np.ndarray:
        """Decode with the reference's failure-recovery chain
        (ref tilevae.py:500-503, 570-573, 625): NaN in the decoded tensor →
        retry with fast-estimated GroupNorm stats → cheap latent→RGB
        approximation as the last-resort result."""
        out = np.asarray(self._decode_tensor(latents, tv))
        if np.isfinite(out).all():
            return tensor_to_image(out)

        print("[Tiled VAE] NaN in decoded image; retrying with estimated "
              "GroupNorm stats (ref tilevae.py:502)", file=__import__('sys').stderr)
        tv_fast = dataclasses.replace(tv or TiledVAEConfig(),
                                      enabled=True, fast_decoder=True,
                                      streaming=False)
        try:
            out = np.asarray(self._decode_tensor(latents, tv_fast))
        except Exception:                            # noqa: BLE001
            out = np.full_like(out, np.nan)
        if np.isfinite(out).all():
            return tensor_to_image(out)

        print("[Tiled VAE] still NaN; returning cheap latent approximation "
              "(ref tilevae.py:570-573)", file=__import__('sys').stderr)
        from .utils.image import cheap_latent_preview

        approx = cheap_latent_preview(
            np.asarray(latents, np.float32) / self.vae.cfg.scaling_factor)
        approx = resize_nchw(jnp.asarray(approx),
                             (latents.shape[-2] * 8, latents.shape[-1] * 8),
                             "linear")
        return tensor_to_image(np.clip(np.asarray(approx), -1.0, 1.0))

    @staticmethod
    def _exact_vae_mode(which: str, tile_size: int, h: int, w: int, B: int,
                        group: int) -> str:
        """HBM guard for the exact tiled-VAE modes — the TPU analogue of the
        reference's VRAM-derived tile sizing (ref tilevae.py:79-99).

        'lockstep'      — all tiles batched through the whole net (fastest),
        'stream-device' — tiles stay in HBM, segments run per group (exact,
                          peak = one layer of all tiles + one group; the
                          4-6K range),
        'stream-host'   — tiles host-resident between segments (exact, fixed
                          HBM; the 8K range).
        Budget: MDU_HBM_BYTES, default 10 GiB of the v5e's 16.
        """
        import os

        from .tiling.tiled_vae import (DECODER_PAD, ENCODER_PAD,
                                       lockstep_footprint_bytes,
                                       plan_vae_tiles,
                                       streaming_device_footprint_bytes)

        pad = ENCODER_PAD if which == "encoder" else DECODER_PAD
        plan = plan_vae_tiles(h, w, tile_size, pad)
        if plan is None:
            return "lockstep"
        budget = int(os.environ.get("MDU_HBM_BYTES", str(10 * 2 ** 30)))
        if lockstep_footprint_bytes(which, tile_size, plan.num_tiles, B) <= budget:
            return "lockstep"
        if streaming_device_footprint_bytes(which, tile_size, plan.num_tiles,
                                            B, group) <= budget:
            return "stream-device"
        return "stream-host"

    def _stream_vae(self, which: str, arr: jnp.ndarray,
                    tv: TiledVAEConfig, host_resident: bool):
        from .tiling.streaming_vae import streaming_tiled_vae

        ts = tv.encoder_tile_size if which == "encoder" else tv.decoder_tile_size
        return streaming_tiled_vae(self.vae, self.vae_params, arr, which, ts,
                                   tv.tile_batch, host_resident=host_resident,
                                   spill_dtype=tv.spill_dtype)

    def _decode_tensor(self, latents: jnp.ndarray,
                       tv: Optional[TiledVAEConfig]) -> jnp.ndarray:
        if tv is not None and tv.enabled and tv.streaming:
            out = self._stream_vae("decoder",
                                   latents / self.vae.cfg.scaling_factor,
                                   tv, host_resident=True)
            if out is not None:
                return out
        elif (tv is not None and tv.enabled and not tv.fast_decoder
                and self.mesh is None):
            mode = self._exact_vae_mode("decoder", tv.decoder_tile_size,
                                        latents.shape[2], latents.shape[3],
                                        latents.shape[0], tv.tile_batch)
            if mode != "lockstep":
                print(f"[Tiled VAE] exact lockstep decode exceeds the HBM "
                      f"budget; switching to {mode} exact mode",
                      file=__import__('sys').stderr)
                out = self._stream_vae(
                    "decoder", latents / self.vae.cfg.scaling_factor, tv,
                    host_resident=(mode == "stream-host"))
                if out is not None:
                    return out

        def builder():
            def run(vp, z):
                z = z / self.vae.cfg.scaling_factor
                if tv is not None and tv.enabled:
                    if self.mesh is not None and not tv.fast_decoder:
                        from .parallel.sharded import sharded_tiled_vae_decode

                        return sharded_tiled_vae_decode(
                            self.mesh, self.vae, vp, z,
                            tile_size=tv.decoder_tile_size)
                    return tiled_vae_decode(self.vae, vp, z,
                                            tile_size=tv.decoder_tile_size,
                                            fast=tv.fast_decoder, tile_batch=tv.tile_batch)
                return self.vae.apply(vp, z, method=self.vae.decode)

            return run

        jkey = ("decode", None if tv is None else
                (tv.enabled, tv.decoder_tile_size, tv.fast_decoder, tv.tile_batch))
        return self._cached_jit(jkey, builder)(self.vae_params, latents)

    def _encode(self, x_img: jnp.ndarray, tv: Optional[TiledVAEConfig]) -> jnp.ndarray:
        if tv is not None and tv.enabled and tv.streaming:
            out = self._stream_vae("encoder", x_img, tv, host_resident=True)
            if out is not None:
                return out
        elif (tv is not None and tv.enabled and not tv.fast_encoder
                and self.mesh is None):
            mode = self._exact_vae_mode("encoder", tv.encoder_tile_size,
                                        x_img.shape[2], x_img.shape[3],
                                        x_img.shape[0], tv.tile_batch)
            if mode != "lockstep":
                print(f"[Tiled VAE] exact lockstep encode exceeds the HBM "
                      f"budget; switching to {mode} exact mode",
                      file=__import__('sys').stderr)
                out = self._stream_vae("encoder", x_img, tv,
                                       host_resident=(mode == "stream-host"))
                if out is not None:
                    return out

        def builder():
            def run(vp, x):
                if tv is not None and tv.enabled:
                    if self.mesh is not None and not tv.fast_encoder:
                        from .parallel.sharded import sharded_tiled_vae_encode_moments

                        return sharded_tiled_vae_encode_moments(
                            self.mesh, self.vae, vp, x,
                            tile_size=tv.encoder_tile_size)
                    return tiled_vae_encode_moments(self.vae, vp, x,
                                                    tile_size=tv.encoder_tile_size,
                                                    fast=tv.fast_encoder,
                                                    tile_batch=tv.tile_batch,
                                                    color_fix=tv.color_fix)
                return self.vae.apply(vp, x, method=self.vae.encode_moments)

            return run

        jkey = ("encode", None if tv is None else
                (tv.enabled, tv.encoder_tile_size, tv.fast_encoder, tv.tile_batch,
                 tv.color_fix))
        return self._cached_jit(jkey, builder)(self.vae_params, x_img)

    # ------------------------------------------------------------------ misc

    def _info(self, sp: SamplerConfig, td: Optional[TiledDiffusionConfig], seed: int,
              region_seeds=None):
        """PNG-info style metadata (ref tilediffusion.py:321-342); region
        entries carry their *resolved* seeds (ref :521)."""
        info: Dict[str, Any] = {
            "Sampler": sp.name, "Steps": sp.steps, "CFG scale": sp.cfg_scale,
            "Seed": seed,
        }
        if sp.image_cfg_scale is not None:
            info["Image CFG scale"] = sp.image_cfg_scale
        if td is not None and td.enabled:
            block = {
                "Method": td.method,
                "Tile tile width": td.tile_w, "Tile tile height": td.tile_h,
                "Tile Overlap": td.overlap, "Tile batch size": td.tile_bs,
            }
            if td.upscaler and td.upscaler != "None":
                block["Upscaler"] = td.upscaler
                block["Upscale factor"] = td.scale_factor
            if td.noise_inverse:
                block.update({
                    "NoiseInv": True, "NoiseInv Steps": td.noise_inverse_steps,
                    "NoiseInv Retouch": td.noise_inverse_retouch,
                    "NoiseInv Renoise strength": td.noise_inverse_renoise_strength,
                    "NoiseInv Kernel size": td.noise_inverse_renoise_kernel,
                })
            if td.regions:
                region_info = {}
                for i, r in enumerate(td.regions):
                    d = dataclasses.asdict(r)
                    if region_seeds is not None and i < len(region_seeds):
                        d["seed"] = int(region_seeds[i])
                    region_info[f"Region {i+1}"] = d
                block["Region control"] = region_info
            info["Tiled Diffusion"] = block
        return info

    def demofusion(self, cond, uncond, width, height, cfg=None,
                   sampler: Optional[SamplerConfig] = None, seed: int = 0,
                   init_latent=None, tiled_vae: Optional[TiledVAEConfig] = None,
                   decode: bool = True):
        """Progressive xN upscaling (ref scripts/tileglobal.py; see
        tiling/demofusion.py)."""
        from .config import DemoFusionConfig
        from .tiling.demofusion import demofusion_generate

        # normalize canvas-shaped guidance leaves to the BASE canvas; the
        # DemoFusion phases rescale them per scale/view themselves
        cond = fit_cond_canvases(cond, (height // 8, width // 8))
        uncond = fit_cond_canvases(uncond, (height // 8, width // 8))
        return demofusion_generate(self, cond, uncond, width, height,
                                   cfg or DemoFusionConfig(), sampler, seed,
                                   init_latent, tiled_vae, decode)

    def free_cache(self):
        """Clear the noise-inversion cache (ref 'Free GPU' button,
        tilediffusion.py:591-593)."""
        self.noise_inverse_cache = None

    def reset(self, clear_compiled: bool = True):
        """Drop caches and report memory (ref reset_and_gc,
        tilediffusion.py:579-609).  Returns the report dict."""
        import gc

        from .utils.telemetry import device_memory_mb, device_peak_memory_mb

        self.free_cache()
        if clear_compiled:
            self._jit_cache.clear()
        gc.collect()
        report = {
            "hbm_in_use_mb": device_memory_mb(),
            "hbm_peak_mb": device_peak_memory_mb(),
        }
        print(f"[Tiled Diffusion] reset: HBM in use "
              f"{report['hbm_in_use_mb']} MB, peak {report['hbm_peak_mb']} MB",
              file=__import__('sys').stderr)
        return report
