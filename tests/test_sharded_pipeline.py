"""Mesh-sharded generation == single-device generation (VERDICT item 1).

The full TileDenoiseFn contract rides the shard: CFG, text conds, scheduled
banks, AND composition, regions, ControlNet-style canvas conds, and the
step index.  North star (BASELINE.md): bitwise-stable tile blending — the
sharded path returns denoised tiles from the shard_map and scatter-adds
them replicated in bbox order (the single-device op sequence), and
``deterministic=True`` pads every UNet call to a uniform tile_bs batch
(XLA is not batch-shape invariant at the last ulp), so sharded latents are
asserted BITWISE equal to single-device, not just close.
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
from mdu_tpu.parallel import make_tile_mesh
from mdu_tpu.pipeline import DiffusionPipeline
from mdu_tpu.utils.bbox import BlendMode, RegionSpec

SAMPLER = SamplerConfig(steps=3)
TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2, deterministic=True)


def _models():
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return unet, up, vae, vp


@pytest.fixture(scope="module")
def pipes():
    unet, up, vae, vp = _models()
    single = DiffusionPipeline(unet, up, vae, vp)
    sharded = DiffusionPipeline(unet, up, vae, vp, mesh=make_tile_mesh(4))
    return single, sharded


def _cond(key, dim=16, L=7):
    return {"crossattn": jax.random.normal(jax.random.PRNGKey(key), (1, L, dim)) * 0.1}


def _close(a, b):
    """Bitwise equality: deterministic fusion is the north-star claim."""
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_txt2img_matches_single_device(pipes):
    single, sharded = pipes
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=42,
              tiled_diffusion=TD, decode=False)
    a = single.txt2img(_cond(0), _cond(1), **kw)
    b = sharded.txt2img(_cond(0), _cond(1), **kw)
    _close(a.latents, b.latents)


def test_sharded_mod_with_regions_matches(pipes):
    single, sharded = pipes
    regions = (
        RegionSpec(x=0.0, y=0.0, w=0.5, h=1.0, blend_mode=BlendMode.BACKGROUND),
        RegionSpec(x=0.5, y=0.0, w=0.25, h=0.5, blend_mode=BlendMode.FOREGROUND,
                   feather_ratio=0.3, seed=7),
    )
    td = dataclasses.replace(TD, method=Method.MIX_DIFF, regions=regions)
    rc = [(_cond(10), _cond(11)), (_cond(12), _cond(13))]
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=3,
              tiled_diffusion=td, region_conds=rc, decode=False)
    a = single.txt2img(_cond(0), _cond(1), **kw)
    b = sharded.txt2img(_cond(0), _cond(1), **kw)
    _close(a.latents, b.latents)


def test_sharded_scheduled_cond_matches(pipes):
    """Scheduled cond banks resolve per step inside jit, then slice per tile."""
    single, sharded = pipes
    bank = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 16)) * 0.1
    cond = {"__bank__": {"crossattn": bank},
            "__index__": jnp.asarray([0, 0, 1], jnp.int32)}
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=9,
              tiled_diffusion=TD, decode=False)
    a = single.txt2img(cond, _cond(1), **kw)
    b = sharded.txt2img(cond, _cond(1), **kw)
    _close(a.latents, b.latents)


def test_sharded_and_composition_matches(pipes):
    single, sharded = pipes
    cond = {"__and__": [_cond(0), _cond(2)], "__weights__": (1.0, 0.6)}
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=4,
              tiled_diffusion=TD, decode=False)
    a = single.txt2img(cond, _cond(1), **kw)
    b = sharded.txt2img(cond, _cond(1), **kw)
    _close(a.latents, b.latents)


def test_sharded_canvas_cond_sliced_per_tile(pipes):
    """A latent-canvas-shaped cond leaf (img2img icond / StableSR-style
    guidance) must be sliced per tile on both paths."""
    single, sharded = pipes
    # canvas-shaped guidance leaf (latent 32x16 for 256x128 px): sliced per
    # tile bbox on both paths; uncond carries the same keys (CFG concats
    # cond pytrees leaf-wise)
    guide = jax.random.normal(jax.random.PRNGKey(8), (1, 0, 16, 32))
    cond = {"crossattn": _cond(0)["crossattn"], "concat": guide}
    uncond = {"crossattn": _cond(1)["crossattn"], "concat": guide}
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=2,
              tiled_diffusion=TD, decode=False)
    a = single.txt2img(cond, uncond, **kw)
    b = sharded.txt2img(cond, uncond, **kw)
    _close(a.latents, b.latents)


def test_sharded_img2img_noise_inverse_matches(pipes):
    single, sharded = pipes
    td = dataclasses.replace(TD, noise_inverse=True, noise_inverse_steps=2,
                             noise_inverse_renoise_strength=0.5)
    sp = SamplerConfig(steps=4, denoising_strength=0.6)
    img = (np.random.default_rng(0).random((128, 256, 3)) * 255).astype(np.uint8)
    a = single.img2img(img, _cond(0), _cond(1), sampler=sp, seed=1,
                       tiled_diffusion=td, decode=False)
    single.free_cache()
    b = sharded.img2img(img, _cond(0), _cond(1), sampler=sp, seed=1,
                        tiled_diffusion=td, decode=False)
    _close(a.latents, b.latents)


def test_sharded_default_mode_close(pipes):
    """Without ``deterministic``, chunk batch shapes differ between the
    paths (single: [2,1]; 4-dev sharded: [1,1,1]) and XLA may compile the
    UNet differently per batch shape — fusion order is still fixed, so
    results agree to float tolerance but not necessarily bitwise."""
    td = dataclasses.replace(TD, deterministic=False)
    single, sharded = pipes
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=42,
              tiled_diffusion=td, decode=False)
    a = single.txt2img(_cond(0), _cond(1), **kw)
    b = sharded.txt2img(_cond(0), _cond(1), **kw)
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               atol=1e-5, rtol=1e-5)


def test_sharded_batch2_matches(pipes):
    single, sharded = pipes
    kw = dict(width=256, height=128, sampler=SAMPLER, seed=42,
              tiled_diffusion=TD, batch_size=2, decode=False)
    a = single.txt2img(_cond(0), _cond(1), **kw)
    b = sharded.txt2img(_cond(0), _cond(1), **kw)
    _close(a.latents, b.latents)


def test_mesh_without_tiles_axis_rejected():
    from jax.sharding import Mesh
    unet, up, vae, vp = _models()
    bad = Mesh(np.array(jax.devices()[:2]), ("dp",))
    with pytest.raises(ValueError, match="tiles"):
        DiffusionPipeline(unet, up, vae, vp, mesh=bad)


def test_sharded_vae_decode_encode_match_single(pipes):
    """Mesh-sharded tiled VAE (psum GroupNorm pooling) == lockstep exact,
    wired through the pipeline's decode/encode when a mesh is set."""
    from mdu_tpu.config import TiledVAEConfig

    single, sharded = pipes
    tv = TiledVAEConfig(encoder_tile_size=96, decoder_tile_size=16,
                        fast_decoder=False, fast_encoder=False)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 24, 24)) * 0.3
    a = single._decode(z, tv)
    b = sharded._decode(z, tv)
    np.testing.assert_allclose(a.astype(np.int16), b.astype(np.int16), atol=1)

    img = (np.random.default_rng(1).random((192, 192, 3)) * 255).astype(np.uint8)
    from mdu_tpu.utils.image import image_to_tensor

    x = image_to_tensor(img)
    ma = single._encode(x, tv)
    mb = sharded._encode(x, tv)
    np.testing.assert_allclose(np.asarray(ma), np.asarray(mb), atol=2e-4, rtol=1e-4)


def test_sharded_deepcache_matches_single(pipes):
    """DeepCache x mesh (VERDICT r4 item 7): the per-chunk feature caches
    shard over the 'tiles' axis with their tiles, so cached steps stay
    device-local.  Compared against the single-device DeepCache run at
    float tolerance — cache chunking is device-major on the mesh (different
    UNet batch grouping from the single path's tile_bs batching)."""
    single, sharded = pipes
    sp = dataclasses.replace(SAMPLER, steps=4, deepcache=2)
    kw = dict(width=256, height=128, sampler=sp, seed=42,
              tiled_diffusion=TD, decode=False)
    a = single.txt2img(_cond(0), _cond(1), **kw)
    b = sharded.txt2img(_cond(0), _cond(1), **kw)
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               atol=1e-5, rtol=1e-5)
