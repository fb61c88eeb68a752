"""DemoFusion phase planning + progressive generation
(ref tile_methods/demofusion.py, scripts/tileglobal.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import DemoFusionConfig, SamplerConfig
from mdu_tpu.tiling.demofusion import (
    make_demofusion_denoiser,
    plan_demofusion_phase,
)


CFG = DemoFusionConfig(window_size=16, overlap=8, tile_bs=4, tile_bs_g=4,
                       scale_factor=2, random_jitter=True)


def test_phase_plan_windows_cover_canvas():
    rng = np.random.default_rng(0)
    plan = plan_demofusion_phase(32, 48, 2, CFG, rng)
    # windows live in padded coords; interior (jitter..jitter+H) must be covered
    jr = plan.jitter
    cover = np.zeros((32 + 2 * jr, 48 + 2 * jr), np.int32)
    for b in plan.windows:
        cover[b.y:b.y + b.h, b.x:b.x + b.w] += 1
    interior = cover[2 * jr:32, 2 * jr:48]  # safely interior region
    assert (interior >= 1).mean() > 0.9     # jitter may leave small gaps


def test_global_offsets_count():
    rng = np.random.default_rng(0)
    plan = plan_demofusion_phase(32, 32, 2, CFG, rng)
    assert len(plan.global_offsets) == 4
    plan_mix = plan_demofusion_phase(
        32, 32, 2, dataclasses.replace(CFG, mixture=True), rng)
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
    """With an identity 'denoiser' and c1=c2=0-ish behavior checks shapes and
    finiteness across the mixed local/global fusion path."""
    cfg = dataclasses.replace(CFG, gaussian_filter=True, sigma=0.6)
    plan = plan_demofusion_phase(32, 32, 2, cfg, np.random.default_rng(1))
    lat0 = jnp.zeros((1, 4, 32, 32))
    noise = jnp.zeros((1, 4, 32, 32))

    def guided(views, sigma, n):
        return views

    fn = make_demofusion_denoiser(plan, cfg, guided, lat0, noise, t_enc=4)
    x = jnp.asarray(rng.normal(size=(1, 4, 32, 32)).astype(np.float32))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_demofusion_generate_end_to_end():
    from mdu_tpu.models import (
        AutoencoderKL, UNet2DCondition, random_params,
        tiny_unet_config, tiny_vae_config,
    )
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1}
    cfg = dataclasses.replace(CFG, scale_factor=2, mixture=True)
    res = pipe.demofusion(cond, uncond, width=128, height=128, cfg=cfg,
                          sampler=SamplerConfig(steps=3, denoising_strength=0.6),
                          seed=5, decode=False)
    # base 16x16 latent -> phase 2: 32x32
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
