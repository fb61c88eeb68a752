"""DeepCache step-level UNet feature caching (arXiv:2312.00858).

No reference analogue — an opt-in TPU-friendly acceleration: every Nth
step runs the full UNet and rewrites a deep-feature cache; intermediate
steps recompute only the shallowest levels (models/unet.py cache modes,
samplers/denoiser.py::denoised_from_model_cached, sampler ``aux``
threading).  These tests pin:

1. write/read bitwise parity at the UNet level (same input -> identical
   output, both archs, both layouts, both branch depths);
2. the stateful plumbing is exact when every executed step is a full step;
3. cached runs produce finite, distinct outputs through the tiled and
   untiled pipelines across sampler families;
4. the STATIC_SIGMA samplers reject caching cleanly.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig
from mdu_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    random_params,
    tiny_unet_config,
    tiny_vae_config,
)
from mdu_tpu.models.unet import tiny_sdxl_unet_config
from mdu_tpu.pipeline import DiffusionPipeline


@pytest.mark.parametrize("layout", ["NCHW", "NHWC"])
@pytest.mark.parametrize("branch", [1, 2])
def test_unet_write_read_parity(rng, layout, branch):
    """A cached pass fed the cache written at the same (x, t, ctx) must
    reproduce the full forward exactly — the deep contribution is the
    cached feature itself, the shallow recompute is identical."""
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg, layout=layout)
    x = jnp.asarray(rng.normal(size=(2, 4, 16, 16)).astype(np.float32))
    t = jnp.asarray([5.0, 9.0])
    ctx = jnp.asarray(rng.normal(size=(2, 7, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, x, t, ctx)
    plain = jax.jit(unet.apply)(params, x, t, ctx)
    out_w, feat = jax.jit(
        lambda p: unet.apply(p, x, t, ctx, cache_mode="write",
                             cache_branch=branch))(params)
    out_r = jax.jit(
        lambda p, f: unet.apply(p, x, t, ctx, cache=f, cache_mode="read",
                                cache_branch=branch))(params, feat)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(plain))
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


def test_unet_write_read_parity_sdxl(rng):
    cfg = tiny_sdxl_unet_config()
    unet = UNet2DCondition(cfg)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16)).astype(np.float32))
    t = jnp.asarray([5.0])
    ctx = jnp.asarray(rng.normal(size=(1, 7, cfg.cross_attention_dim)).astype(np.float32))
    ac = {"text_embeds": jnp.zeros((1, cfg.addition_pooled_dim)),
          "time_ids": jnp.ones((1, cfg.num_time_ids))}
    params = random_params(unet, 0, x, t, ctx, ac)
    plain = jax.jit(lambda p: unet.apply(p, x, t, ctx, ac))(params)
    out_w, feat = jax.jit(
        lambda p: unet.apply(p, x, t, ctx, ac, cache_mode="write"))(params)
    out_r = jax.jit(
        lambda p, f: unet.apply(p, x, t, ctx, ac, cache=f,
                                cache_mode="read"))(params, feat)
    np.testing.assert_array_equal(np.asarray(out_w), np.asarray(plain))
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(plain),
                               rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def pipe():
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def _cond(key, dim=16, L=7):
    return {"crossattn": jax.random.normal(jax.random.PRNGKey(key), (1, L, dim)) * 0.1}


TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2)


def test_single_step_deepcache_equals_plain(pipe):
    """With one sampling step only the (full) step 0 executes — the cached
    program must reproduce the plain program."""
    sp = SamplerConfig(steps=1)
    a = pipe.txt2img(_cond(0), _cond(1), 256, 128, sp, seed=42,
                     tiled_diffusion=TD, decode=False)
    b = pipe.txt2img(_cond(0), _cond(1), 256, 128,
                     dataclasses.replace(sp, deepcache=2), seed=42,
                     tiled_diffusion=TD, decode=False)
    np.testing.assert_allclose(np.asarray(b.latents), np.asarray(a.latents),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["Euler", "Euler a", "Heun", "DPM++ 2M",
                                  "DPM++ 2M SDE", "LMS", "PLMS"])
def test_deepcache_sampler_families(pipe, name):
    """Cached runs stay finite and actually take the cached branch (output
    differs from the exact run) across the sampler families."""
    sp = SamplerConfig(name=name, steps=4)
    exact = pipe.txt2img(_cond(0), _cond(1), 128, 128, sp, seed=3, decode=False)
    fast = pipe.txt2img(_cond(0), _cond(1), 128, 128,
                        dataclasses.replace(sp, deepcache=2), seed=3,
                        decode=False)
    assert np.isfinite(np.asarray(fast.latents)).all()
    assert not np.allclose(np.asarray(fast.latents), np.asarray(exact.latents))


def test_deepcache_static_sigma_sampler_rejected(pipe):
    sp = SamplerConfig(name="Restart", steps=4, deepcache=2)
    with pytest.raises(ValueError, match="DeepCache"):
        pipe.txt2img(_cond(0), _cond(1), 128, 128, sp, seed=3, decode=False)


def test_deepcache_tiled_regions_run_full(pipe):
    """Regions are excluded from caching: a regioned cached run works and
    the region denoiser still runs the full model (finite output)."""
    from mdu_tpu.utils.bbox import BlendMode, RegionSpec

    td = dataclasses.replace(
        TD, regions=(RegionSpec(0.0, 0.0, 0.5, 0.5,
                                blend_mode=BlendMode.BACKGROUND),))
    sp = SamplerConfig(steps=3, deepcache=2)
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, sp, seed=5,
                       tiled_diffusion=td, decode=False,
                       region_conds=[(_cond(2), _cond(3))])
    assert np.isfinite(np.asarray(res.latents)).all()


def test_deepcache_img2img_mask(pipe, rng):
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    msk = (np.ones((128, 128)) * 255).astype(np.uint8)
    sp = SamplerConfig(steps=4, deepcache=2)
    res = pipe.img2img(img, _cond(0), _cond(1), sp, seed=2,
                       tiled_diffusion=TD, mask=msk, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_deepcache_scan_grid_parity(pipe):
    """DeepCache through the lax.scan tile grid (the 8K path: scan
    auto-engages at >=8 tile batches): per-chunk caches ride the scan as
    xs->ys and the result matches the trace-time-unrolled stateful grid.
    512x256 px -> 64x32 latent, 16x16 tiles, overlap 8 => 21 tiles = 11
    chunks of tile_bs=2."""
    sp = SamplerConfig(steps=4, deepcache=2)
    unrolled = pipe.txt2img(_cond(0), _cond(1), 512, 256, sp, seed=1,
                            tiled_diffusion=dataclasses.replace(TD, tile_scan=False),
                            decode=False)
    scanned = pipe.txt2img(_cond(0), _cond(1), 512, 256, sp, seed=1,
                           tiled_diffusion=dataclasses.replace(TD, tile_scan=True),
                           decode=False)
    assert np.isfinite(np.asarray(scanned.latents)).all()
    np.testing.assert_allclose(np.asarray(scanned.latents),
                               np.asarray(unrolled.latents),
                               rtol=1e-5, atol=1e-5)
    # the cached branch is actually taken: deepcache=2 differs from exact
    exact = pipe.txt2img(_cond(0), _cond(1), 512, 256,
                         dataclasses.replace(sp, deepcache=1), seed=1,
                         tiled_diffusion=dataclasses.replace(TD, tile_scan=True),
                         decode=False)
    assert not np.allclose(np.asarray(scanned.latents), np.asarray(exact.latents))


def test_deepcache_mesh_rejected(pipe):
    """Mesh sharding + DeepCache stays a clear error."""
    from mdu_tpu.tiling.schedulers import make_tiled_denoiser, plan_tiled_diffusion
    from mdu_tpu.parallel import make_tile_mesh

    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 32, 64, tile_h=16,
                                tile_w=16, overlap=8, tile_bs=2)
    mesh = make_tile_mesh(2)
    with pytest.raises(ValueError, match="DeepCache"):
        make_tiled_denoiser(plan, lambda *a: a[0], mesh=mesh,
                            sharded_tile_denoise=lambda *a: a[0],
                            tile_conds_fn=lambda s: None, stateful=True)
