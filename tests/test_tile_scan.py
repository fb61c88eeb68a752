"""lax.scan tile grid == unrolled tile grid (compile-scalable 8K tiling).

`tile_scan=True` rolls the per-tile-batch loop into a lax.scan whose body
compiles once for any tile count (tiling/schedulers.py::_make_scan_grid) —
required at 8K where ~18 unrolled UNet graphs would blow the compile
budget.  These tests pin the scan path to the unrolled reference on every
cond-contract feature (CFG, AND, scheduled banks, canvas conds, regions,
MoD weighting, noise inversion).
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
from mdu_tpu.pipeline import DiffusionPipeline
from mdu_tpu.utils.bbox import BlendMode, RegionSpec

SAMPLER = SamplerConfig(steps=3)
# tile_bs=2 over 3 tiles: exercises ragged-chunk padding in the scan
TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2)
TD_SCAN = dataclasses.replace(TD, tile_scan=True)


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


def _close(a, b, atol=2e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=1e-5)


def test_scan_txt2img_matches_unrolled(pipe):
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=42, decode=False)
    a = pipe.txt2img(_cond(0), _cond(1), tiled_diffusion=TD, **kw)
    b = pipe.txt2img(_cond(0), _cond(1), tiled_diffusion=TD_SCAN, **kw)
    _close(a.latents, b.latents)


def test_scan_mod_with_regions_matches(pipe):
    regions = (
        RegionSpec(x=0.0, y=0.0, w=0.5, h=1.0, blend_mode=BlendMode.BACKGROUND),
        RegionSpec(x=0.5, y=0.0, w=0.25, h=0.5, blend_mode=BlendMode.FOREGROUND,
                   feather_ratio=0.3, seed=7),
    )
    rc = [(_cond(10), _cond(11)), (_cond(12), _cond(13))]
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=3,
              region_conds=rc, decode=False)
    td = dataclasses.replace(TD, method=Method.MIX_DIFF, regions=regions)
    td_s = dataclasses.replace(td, tile_scan=True)
    a = pipe.txt2img(_cond(0), _cond(1), tiled_diffusion=td, **kw)
    b = pipe.txt2img(_cond(0), _cond(1), tiled_diffusion=td_s, **kw)
    _close(a.latents, b.latents)


def test_scan_and_scheduled_cond_matches(pipe):
    bank = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 16)) * 0.1
    sched = {"__bank__": {"crossattn": bank},
             "__index__": jnp.asarray([0, 0, 1], jnp.int32)}
    cond = {"__and__": [sched, _cond(2)], "__weights__": (1.0, 0.6)}
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=9, decode=False)
    a = pipe.txt2img(cond, _cond(1), tiled_diffusion=TD, **kw)
    b = pipe.txt2img(cond, _cond(1), tiled_diffusion=TD_SCAN, **kw)
    _close(a.latents, b.latents)


def test_scan_canvas_cond_matches(pipe):
    guide = jax.random.normal(jax.random.PRNGKey(8), (1, 0, 16, 32))
    cond = {"crossattn": _cond(0)["crossattn"], "concat": guide}
    uncond = {"crossattn": _cond(1)["crossattn"], "concat": guide}
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=2, decode=False)
    a = pipe.txt2img(cond, uncond, tiled_diffusion=TD, **kw)
    b = pipe.txt2img(cond, uncond, tiled_diffusion=TD_SCAN, **kw)
    _close(a.latents, b.latents)


def test_scan_img2img_noise_inverse_matches(pipe):
    sp = SamplerConfig(steps=4, denoising_strength=0.6)
    img = (np.random.default_rng(0).random((128, 256, 3)) * 255).astype(np.uint8)
    td = dataclasses.replace(TD, noise_inverse=True, noise_inverse_steps=2,
                             noise_inverse_renoise_strength=0.5)
    td_s = dataclasses.replace(td, tile_scan=True)
    a = pipe.img2img(img, _cond(0), _cond(1), sampler=sp, seed=1,
                     tiled_diffusion=td, decode=False)
    pipe.free_cache()
    b = pipe.img2img(img, _cond(0), _cond(1), sampler=sp, seed=1,
                     tiled_diffusion=td_s, decode=False)
    pipe.free_cache()
    # inversion divides by sigma_min (~0.03), amplifying program-shape ulps
    _close(a.latents, b.latents, atol=2e-4)


def test_scan_auto_threshold(monkeypatch):
    """Auto mode turns the scan on at MDU_TILE_SCAN_THRESHOLD batches and
    deterministic mode forces it off."""
    from mdu_tpu.tiling.schedulers import plan_tiled_diffusion

    p = plan_tiled_diffusion(Method.MULTI_DIFF, 128, 128, tile_h=16,
                             tile_w=16, overlap=8, tile_bs=2)
    assert p.num_batches >= 8 and p.scan_tiles
    monkeypatch.setenv("MDU_TILE_SCAN_THRESHOLD", "999")
    p2 = plan_tiled_diffusion(Method.MULTI_DIFF, 128, 128, tile_h=16,
                              tile_w=16, overlap=8, tile_bs=2)
    assert not p2.scan_tiles
    p3 = plan_tiled_diffusion(Method.MULTI_DIFF, 128, 128, tile_h=16,
                              tile_w=16, overlap=8, tile_bs=2,
                              tile_scan=True, uniform_batches=True)
    assert not p3.scan_tiles
