"""DemoFusion phase planning + progressive generation
(ref tile_methods/demofusion.py, scripts/tileglobal.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import DemoFusionConfig, SamplerConfig
from mdu_tpu.tiling.demofusion import (
    draw_jitter,
    make_demofusion_denoiser,
    plan_demofusion_phase,
)


CFG = DemoFusionConfig(window_size=16, overlap=8, tile_bs=4, tile_bs_g=4,
                       scale_factor=2, random_jitter=True)


def _pipe(tiny_cfg=None):
    from mdu_tpu.models import (
        AutoencoderKL, UNet2DCondition, random_params,
        tiny_unet_config, tiny_vae_config,
    )
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_cfg or tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def test_phase_plan_windows_cover_canvas():
    plan = plan_demofusion_phase(32, 48, 2, CFG)
    # un-jittered bases must cover the whole canvas exactly
    cover = np.zeros((32, 48), np.int32)
    for b in plan.windows:
        cover[b.y:b.y + b.h, b.x:b.x + b.w] += 1
    assert (cover >= 1).all()


def test_jitter_ranges_respect_edges():
    plan = plan_demofusion_phase(32, 48, 2, CFG)
    jit = draw_jitter(plan, np.random.default_rng(0))
    assert jit.shape == (len(plan.windows), 2)
    for (b, j) in zip(plan.windows, jit):
        y, x = b.y + int(j[0]), b.x + int(j[1])
        assert 0 <= y <= 32 - plan.tile and 0 <= x <= 48 - plan.tile
    # edge windows never jitter outward
    for b, lo, hi in zip(plan.windows, plan.jitter_lo, plan.jitter_hi):
        if b.x == 0:
            assert lo[1] == 0
        if b.x + b.w == 48:
            assert hi[1] == 0


def test_global_offsets_count():
    plan = plan_demofusion_phase(32, 32, 2, CFG)
    assert len(plan.global_offsets) == 4
    plan_mix = plan_demofusion_phase(
        32, 32, 2, dataclasses.replace(CFG, mixture=True))
    assert len(plan_mix.global_offsets) == 8


def test_dilated_views_partition():
    """Every canvas pixel belongs to exactly one dilated view per offset set."""
    s = 3
    H = W = 12
    cover = np.zeros((H, W), np.int32)
    for oy in range(s):
        for ox in range(s):
            cover[oy::s, ox::s] += 1
    assert (cover == 1).all()


def test_demofusion_denoiser_identity_fusion(rng):
    """With an identity 'denoiser' this checks shapes and finiteness across
    the mixed local/global fusion path, with jittered dynamic windows."""
    cfg = dataclasses.replace(CFG, gaussian_filter=True, sigma=0.6)
    plan = plan_demofusion_phase(32, 32, 2, cfg)
    lat0 = jnp.zeros((1, 4, 32, 32))
    noise = jnp.zeros((1, 4, 32, 32))

    def guided(views, sigma, c, u):
        return views

    jit_arr = jnp.asarray(draw_jitter(plan, np.random.default_rng(1)))
    fn = make_demofusion_denoiser(plan, cfg, guided, {"crossattn": jnp.zeros((1, 7, 16))},
                                  None, lat0, noise, t_enc=4, jitter=jit_arr)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_demofusion_generate_end_to_end():
    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True)
    res = pipe.demofusion(cond, uncond, width=128, height=128, cfg=cfg,
                          sampler=SamplerConfig(steps=3, denoising_strength=0.6),
                          seed=5, decode=False)
    # base 16x16 latent -> phase 2: 32x32
    assert res.latents.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_demofusion_reuses_cached_executables():
    """Second call with the same config must not add jit-cache entries —
    jitter is a traced argument, not baked geometry (VERDICT weak 4)."""
    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2)
    sp = SamplerConfig(steps=2, denoising_strength=0.6)
    a = pipe.demofusion(cond, None, 128, 128, cfg, sp, seed=5, decode=False)
    n = len(pipe._jit_cache)
    b = pipe.demofusion(cond, None, 128, 128, cfg, sp, seed=6, decode=False)
    assert len(pipe._jit_cache) == n, "repeat call must reuse executables"
    # different seed -> different jitter -> different output
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-6


def test_demofusion_scheduled_and_composed_conds():
    """Scheduled banks and AND compositions ride through DemoFusion
    (ref consumes standard A1111 conds, demofusion.py:219-324)."""
    pipe = _pipe()
    bank = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 16)) * 0.1
    sched_cond = {"__bank__": {"crossattn": bank},
                  "__index__": jnp.asarray([0, 1, 1], jnp.int32)}
    uncond = {"crossattn": jnp.zeros((1, 7, 16))}
    cfg = dataclasses.replace(CFG, scale_factor=2)
    sp = SamplerConfig(steps=3, denoising_strength=0.8)
    res = pipe.demofusion(sched_cond, uncond, 128, 128, cfg, sp, seed=1, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    # the schedule switch at step 1 must matter
    flat = {"crossattn": bank[:1]}
    res2 = pipe.demofusion(flat, uncond, 128, 128, cfg, sp, seed=1, decode=False)
    assert np.abs(np.asarray(res.latents) - np.asarray(res2.latents)).max() > 1e-6

    and_cond = {"__and__": [{"crossattn": bank[:1]}, {"crossattn": bank[1:]}],
                "__weights__": (1.0, 0.5)}
    res3 = pipe.demofusion(and_cond, uncond, 128, 128, cfg, sp, seed=1, decode=False)
    assert np.isfinite(np.asarray(res3.latents)).all()


def test_demofusion_spatial_concat_cond():
    """Inpaint-model-style canvas 'concat' leaves resize per phase and slice
    per window / dilated view (VERDICT missing 3)."""
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, random_params,
                                tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    # inpaint-shaped UNet: 4 latent + 5 concat channels
    ucfg = dataclasses.replace(tiny_unet_config(), in_channels=9)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 9, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    concat = jax.random.normal(jax.random.PRNGKey(9), (1, 5, 16, 16)) * 0.1
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1,
            "concat": concat}
    uncond = {"crossattn": jnp.zeros((1, 7, 16)), "concat": concat}
    cfg = dataclasses.replace(CFG, scale_factor=2)
    res = pipe.demofusion(cond, uncond, 128, 128, cfg,
                          SamplerConfig(steps=2, denoising_strength=0.6),
                          seed=2, decode=False)
    assert res.latents.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_demofusion_controlnet_hint():
    """Pixel-space ControlNet hints ride DemoFusion phases: resized with the
    canvas, sliced per local window, downsampled per dilated global view
    (regression: the global path replicated the full-canvas hint, giving
    2x-sized residuals at phase scale 2)."""
    from mdu_tpu.models import (AutoencoderKL, ControlNet, UNet2DCondition,
                                random_params, tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    cn = ControlNet(ucfg)
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    cp = random_params(cn, 2, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)),
                       jnp.zeros((1, 3, 128, 128)))
    pipe = DiffusionPipeline(unet, up, vae, vp, controlnet=cn, controlnet_params=cp)

    hint = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 128, 128)) * 0.1
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1,
            "control": [hint]}
    uncond = {"crossattn": jnp.zeros((1, 7, 16)), "control": [hint]}
    cfg = dataclasses.replace(CFG, scale_factor=2)
    res = pipe.demofusion(cond, uncond, 128, 128, cfg,
                          SamplerConfig(steps=2, denoising_strength=0.6),
                          seed=2, decode=False)
    assert res.latents.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_demofusion_sdxl_conds():
    """DemoFusion passes SDXL vector/time_ids conds through its view batching."""
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, random_params,
                                tiny_sdxl_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_sdxl_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    added = {"text_embeds": jnp.zeros((1, ucfg.addition_pooled_dim)),
             "time_ids": jnp.ones((1, 6))}
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)), added)
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1,
            "vector": jnp.ones((1, ucfg.addition_pooled_dim)) * 0.1,
            "time_ids": jnp.asarray([[128.0, 128, 0, 0, 128, 128]])}
    uncond = dict(cond, crossattn=jnp.zeros((1, 7, 16)))
    cfg = dataclasses.replace(CFG, scale_factor=2)
    res = pipe.demofusion(cond, uncond, 128, 128, cfg,
                          SamplerConfig(steps=2, denoising_strength=0.6),
                          seed=3, decode=False)
    assert res.latents.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_demofusion_metadata_roundtrip():
    """A DemoFusion run must be reproducible from its own PNG metadata
    (ref tileglobal.py:28-40 phase sizes, :172-191 infotext rewriting):
    config.demofusion_from_png_info inverts GenerationResult.info."""
    import json

    from mdu_tpu.config import demofusion_from_png_info

    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True,
                              cosine_scale_1=2.5, sigma=0.7,
                              denoise_strengths=(0.5,))
    sp = SamplerConfig(name="Euler", steps=2, cfg_scale=6.5,
                       denoising_strength=0.5)
    res = pipe.demofusion(cond, None, 128, 128, cfg, sp, seed=5, decode=False)
    # survive a JSON round-trip like the PNG text chunk does
    info = json.loads(json.dumps(res.info))
    cfg2, sp2 = demofusion_from_png_info(info)
    assert cfg2 == dataclasses.replace(cfg, enabled=True)
    assert (sp2.name, sp2.steps, sp2.cfg_scale) == ("Euler", 2, 6.5)
    # every produced phase records its pixel size (base 128 + phase-2 256)
    assert info["DemoFusion"]["Phase sizes"] == [[128, 128], [256, 256]]
    assert info["Seed"] == 5


def test_demofusion_scan_matches_unrolled(rng):
    """scan_windows=True (one UNet body per HLO — the 16 GiB compile-OOM
    fix) must reproduce the unrolled path: same windows, same fusion, the
    padded tail window zero-weighted.  Geometry chosen for a non-uniform
    tail batch (9 windows / tile_bs 2) + doubled mixture offsets."""
    cfg = dataclasses.replace(CFG, window_size=16, overlap=8, tile_bs=2,
                              tile_bs_g=3, scale_factor=2, mixture=True,
                              gaussian_filter=True, sigma=0.6)
    plan = plan_demofusion_phase(32, 32, 2, cfg)
    assert len(plan.window_batches[-1]) == 1      # 9 windows / bs 2: real tail
    lat0 = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32)) * 0.1
    noise = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    cond = {"crossattn": jnp.zeros((1, 7, 16)),
            "canvas": jnp.asarray(rng.normal(size=(1, 2, 32, 32)).astype(np.float32))}

    def guided(views, sigma, c, u):
        # cond-sensitive pseudo-denoiser: canvas leaf participates so the
        # scan path's reshape-and-take cond slicing is exercised
        return views * 0.9 + 0.05 * c["canvas"][:, :1] if isinstance(c, dict) \
            and "canvas" in c else views * 0.9

    jit_arr = jnp.asarray(draw_jitter(plan, np.random.default_rng(4)))
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))

    outs = {}
    for scan in (False, True):
        c = dataclasses.replace(cfg, scan_windows=scan)
        fn = make_demofusion_denoiser(plan, c, guided, cond, None, lat0,
                                      noise, t_enc=4, jitter=jit_arr)
        outs[scan] = np.asarray(jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0)))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-5, atol=1e-5)


def test_demofusion_generate_scan_end_to_end():
    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True, tile_bs=2,
                              tile_bs_g=2, scan_windows=True)
    res = pipe.demofusion(cond, uncond, width=128, height=128, cfg=cfg,
                          sampler=SamplerConfig(steps=2, denoising_strength=0.6),
                          seed=5, decode=False)
    assert res.latents.shape == (1, 4, 32, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_demofusion_mesh_matches_unrolled(rng):
    """Mesh-sharded windows + dilated views (VERDICT r4 item 5) must
    reproduce the single-device fusion: tiles gathered replicated, denoised
    per shard, scattered replicated in window/view order.  Parity to 1e-5
    like the scan-vs-unrolled test — the two programs compile separately
    and XLA:CPU codegen differs at the last ulp."""
    from mdu_tpu.parallel import make_tile_mesh

    cfg = dataclasses.replace(CFG, window_size=16, overlap=8, tile_bs=2,
                              tile_bs_g=3, scale_factor=2, mixture=True,
                              gaussian_filter=True, sigma=0.6)
    plan = plan_demofusion_phase(32, 32, 2, cfg)
    lat0 = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32)) * 0.1
    noise = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    cond = {"crossattn": jnp.zeros((1, 7, 16)),
            "canvas": jnp.asarray(rng.normal(size=(1, 2, 32, 32)).astype(np.float32))}

    def guided(views, sigma, c, u):
        return views * 0.9 + 0.05 * c["canvas"][:, :1] if isinstance(c, dict) \
            and "canvas" in c else views * 0.9

    jit_arr = jnp.asarray(draw_jitter(plan, np.random.default_rng(4)))
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))

    base = make_demofusion_denoiser(
        plan, dataclasses.replace(cfg, scan_windows=False), guided, cond,
        None, lat0, noise, t_enc=4, jitter=jit_arr)
    mesh = make_tile_mesh(4)
    shard = make_demofusion_denoiser(
        plan, cfg, guided, cond, None, lat0, noise, t_enc=4, jitter=jit_arr,
        mesh=mesh)
    a = np.asarray(jax.jit(base)(x, jnp.asarray(1.0), jnp.asarray(0)))
    b = np.asarray(jax.jit(shard)(x, jnp.asarray(1.0), jnp.asarray(0)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_demofusion_mesh_generate_matches_single():
    """End-to-end pipe.demofusion over a 4-device mesh == single device.
    Tolerance (not bitwise): the mesh path pads UNet chunks to uniform
    tile_bs while the unrolled path runs ragged tails, and XLA is not
    batch-shape invariant at the last ulp."""
    from mdu_tpu.parallel import make_tile_mesh

    unet_vae = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True, tile_bs=2,
                              tile_bs_g=2)
    kw = dict(width=128, height=128, cfg=cfg, seed=5, decode=False,
              sampler=SamplerConfig(steps=2, denoising_strength=0.6))
    a = unet_vae.demofusion(cond, uncond, **kw)

    from mdu_tpu.pipeline import DiffusionPipeline
    sharded = DiffusionPipeline(unet_vae.unet, unet_vae.unet_params,
                                unet_vae.vae, unet_vae.vae_params,
                                mesh=make_tile_mesh(4))
    b = sharded.demofusion(cond, uncond, **kw)
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               rtol=2e-4, atol=2e-4)


def test_demofusion_deepcache_step0_matches_exact():
    """DeepCache on the global dilated-view leg (VERDICT r4 item 7): at
    step 0 the full model runs and the zero-init cache is never consumed,
    so the stateful denoiser == the exact one to float tolerance — and the
    returned cache must have been written (non-zero).  Tolerance 1e-4: the
    full pass inside lax.cond (cache_mode='write') is a structurally
    different program from the plain UNet and XLA:CPU fuses it differently
    (measured max |d| 2.6e-5 on this config)."""
    from mdu_tpu.tiling.demofusion import demofusion_deepcache_aux

    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True, tile_bs=2,
                              tile_bs_g=2, scan_windows=False)
    plan = plan_demofusion_phase(32, 32, 2, cfg)
    rng = np.random.default_rng(0)
    lat0 = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32)) * 0.1
    noise = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    jit_arr = jnp.asarray(draw_jitter(plan, np.random.default_rng(4)))

    guided, _, guided_c = pipe._make_guided(7.0, pipe.unet_params, None, 1)
    base = make_demofusion_denoiser(
        plan, cfg, guided, cond, uncond, lat0, noise, t_enc=4, jitter=jit_arr)
    dc = make_demofusion_denoiser(
        plan, cfg, guided, cond, uncond, lat0, noise, t_enc=4, jitter=jit_arr,
        guided_cached=guided_c, deepcache=2)
    aux = demofusion_deepcache_aux(pipe, plan, cfg, False, 7.0, 0, 1, 1)
    a = jax.jit(base)(x, jnp.asarray(1.0), jnp.asarray(0))
    b, naux = jax.jit(dc)(x, jnp.asarray(1.0), jnp.asarray(0), aux)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
    assert any(float(jnp.abs(l).max()) > 0 for l in jax.tree.leaves(naux))


def test_demofusion_deepcache_scan_matches_unrolled():
    """Cache threading parity across program forms: lax.scan xs/ys cache
    (uniform [n_batches, ...] stack) vs the unrolled per-batch tuple must
    produce the same latents over cached steps."""
    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    sp = SamplerConfig(steps=4, denoising_strength=0.9, deepcache=2)
    cfg_u = dataclasses.replace(CFG, scale_factor=2, mixture=True, tile_bs=2,
                                tile_bs_g=2, scan_windows=False)
    cfg_s = dataclasses.replace(cfg_u, scan_windows=True)
    kw = dict(width=128, height=128, seed=11, decode=False, sampler=sp)
    a = pipe.demofusion(cond, uncond, cfg=cfg_u, **kw)
    b = pipe.demofusion(cond, uncond, cfg=cfg_s, **kw)
    assert np.isfinite(np.asarray(a.latents)).all()
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               rtol=1e-5, atol=1e-5)


def test_demofusion_deepcache_mesh_matches_single():
    """DeepCache x mesh on the global leg: per-view feature caches shard
    over the 'tiles' axis with their views (device-local across steps)."""
    from mdu_tpu.parallel import make_tile_mesh
    from mdu_tpu.pipeline import DiffusionPipeline

    pipe = _pipe()
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    sp = SamplerConfig(steps=4, denoising_strength=0.9, deepcache=2)
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True, tile_bs=2,
                              tile_bs_g=2, scan_windows=False)
    kw = dict(width=128, height=128, cfg=cfg, seed=11, decode=False, sampler=sp)
    a = pipe.demofusion(cond, uncond, **kw)
    sharded = DiffusionPipeline(pipe.unet, pipe.unet_params,
                                pipe.vae, pipe.vae_params,
                                mesh=make_tile_mesh(4))
    b = sharded.demofusion(cond, uncond, **kw)
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               rtol=2e-4, atol=2e-4)
