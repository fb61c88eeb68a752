"""Edit-model (instruct-pix2pix) 3-way image CFG and unclip 'adm' icond.

The reference supports both cond variants through its CondDict accessors:
the 3-way [cond, uncond, uncond] edit-model batch layout
(ref abstractdiffusion.py:17-19, 278-310, 330-427) and the 'c_adm' icond
for unclip-class models (ref abstractdiffusion.py:133-168).  Here they are
explicit: SamplerConfig.image_cfg_scale drives 3-way guidance in
pipeline._make_guided, and cond['adm'] rides the cond pytree into the
UNet's label-embedding MLP (models/unet.py adm_in_channels).
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

TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2)


@pytest.fixture(scope="module")
def edit_pipe():
    """ip2p-shaped tiny UNet: 8 input channels (4 latent + 4 image concat)."""
    ucfg = dataclasses.replace(tiny_unet_config(), in_channels=8)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 8, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def _edit_conds(h, w, dim=16, L=7):
    ilat = jax.random.normal(jax.random.PRNGKey(9), (1, 4, h, w)) * 0.1
    c = {"crossattn": jax.random.normal(jax.random.PRNGKey(0), (1, L, dim)) * 0.1,
         "concat": ilat}
    u = {"crossattn": jax.random.normal(jax.random.PRNGKey(1), (1, L, dim)) * 0.1,
         "concat": ilat}
    return c, u


def test_image_cfg_one_equals_two_way(edit_pipe):
    """du + 1*(di-du) + cfg*(dc-di) == di + cfg*(dc-di): with image_cfg=1
    the 3-way program must reproduce 2-way CFG whose uncond carries the same
    image conditioning (ref: A1111's combine_denoised_for_edit_model)."""
    c, u = _edit_conds(16, 16)
    sp = SamplerConfig(steps=3)
    a = edit_pipe.txt2img(c, u, 128, 128, sp, seed=7, decode=False)
    b = edit_pipe.txt2img(c, u, 128, 128,
                          dataclasses.replace(sp, image_cfg_scale=1.0),
                          seed=7, decode=False)
    np.testing.assert_allclose(np.asarray(b.latents), np.asarray(a.latents),
                               rtol=2e-5, atol=2e-5)


def test_image_cfg_scale_changes_output(edit_pipe):
    c, u = _edit_conds(16, 16)
    sp = SamplerConfig(steps=3, image_cfg_scale=1.5)
    a = edit_pipe.txt2img(c, u, 128, 128, sp, seed=7, decode=False)
    b = edit_pipe.txt2img(c, u, 128, 128,
                          dataclasses.replace(sp, image_cfg_scale=1.0),
                          seed=7, decode=False)
    assert np.isfinite(np.asarray(a.latents)).all()
    assert not np.allclose(np.asarray(a.latents), np.asarray(b.latents))


def test_image_cfg_tiled_run(edit_pipe):
    """Tiled edit-model upscale path: the canvas-shaped 'concat' leaf is
    sliced per tile and the 3-way guidance runs inside the tile denoiser."""
    c, u = _edit_conds(32, 64)
    sp = SamplerConfig(steps=2, image_cfg_scale=1.5)
    res = edit_pipe.txt2img(c, u, 512, 256, sp, seed=3, tiled_diffusion=TD,
                            decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    # through the lax.scan grid too (the 8K program shape)
    res2 = edit_pipe.txt2img(c, u, 512, 256, sp, seed=3,
                             tiled_diffusion=dataclasses.replace(TD, tile_scan=True),
                             decode=False)
    np.testing.assert_allclose(np.asarray(res2.latents), np.asarray(res.latents),
                               rtol=1e-5, atol=1e-5)


def test_image_cfg_deepcache(edit_pipe):
    """DeepCache threads the 3-way (mult=3) cache batch."""
    c, u = _edit_conds(32, 64)
    sp = SamplerConfig(steps=4, image_cfg_scale=1.5, deepcache=2)
    res = edit_pipe.txt2img(c, u, 512, 256, sp, seed=3, tiled_diffusion=TD,
                            decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_image_cfg_img2img_auto_concat(edit_pipe):
    """img2img with image_cfg_scale and NO explicit 'concat' attaches the
    post-upscale init-latent mode itself — the canvas must match the
    generation latent, not the raw init image (round-4 CLI e2e regression:
    the CLI used to encode the pre-upscale init and trip the edit-leg
    shape check)."""
    rng = np.random.default_rng(0)
    img = (rng.random((64, 128, 3)) * 255).astype(np.uint8)
    c = {"crossattn": jax.random.normal(jax.random.PRNGKey(0), (1, 7, 16)) * 0.1}
    u = {"crossattn": jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16)) * 0.1}
    sp = SamplerConfig(steps=2, image_cfg_scale=1.5, denoising_strength=0.6)
    td = dataclasses.replace(TD, upscaler="Lanczos", scale_factor=2.0)
    res = edit_pipe.img2img(img, c, u, sp, seed=3, tiled_diffusion=td,
                            decode=False)
    # 64x128 init x2 -> 128x256 -> latent 16x32
    assert res.latents.shape[-2:] == (16, 32)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_image_cfg_requires_concat(edit_pipe):
    c, u = _edit_conds(16, 16)
    u_bad = {"crossattn": u["crossattn"]}
    sp = SamplerConfig(steps=2, image_cfg_scale=1.5)
    with pytest.raises(ValueError, match="image_cfg_scale"):
        edit_pipe.txt2img(c, u_bad, 128, 128, sp, seed=1, decode=False)


# ------------------------------------------------------------------ unclip


@pytest.fixture(scope="module")
def unclip_pipe():
    ucfg = dataclasses.replace(tiny_unet_config(), adm_in_channels=8)
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)),
                       {"adm": jnp.zeros((1, 8))})
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def _unclip_conds(adm_seed=5, dim=16, L=7):
    c = {"crossattn": jax.random.normal(jax.random.PRNGKey(0), (1, L, dim)) * 0.1,
         "adm": jax.random.normal(jax.random.PRNGKey(adm_seed), (1, 8)) * 0.1}
    u = {"crossattn": jnp.zeros((1, L, dim)),
         "adm": c["adm"]}
    return c, u


def test_unclip_adm_tiled(unclip_pipe):
    """cond['adm'] is replicated per tile (vector-leaf rule, tiling/conds.py)
    and reaches the label-embedding MLP — changing it changes the output."""
    sp = SamplerConfig(steps=2)
    c1, u1 = _unclip_conds(adm_seed=5)
    c2, u2 = _unclip_conds(adm_seed=6)
    a = unclip_pipe.txt2img(c1, u1, 256, 128, sp, seed=4, tiled_diffusion=TD,
                            decode=False)
    b = unclip_pipe.txt2img(c2, u2, 256, 128, sp, seed=4, tiled_diffusion=TD,
                            decode=False)
    assert np.isfinite(np.asarray(a.latents)).all()
    assert not np.allclose(np.asarray(a.latents), np.asarray(b.latents))


def test_unclip_missing_adm_raises(unclip_pipe):
    sp = SamplerConfig(steps=1)
    c = {"crossattn": jnp.zeros((1, 7, 16))}
    with pytest.raises(ValueError, match="adm"):
        unclip_pipe.txt2img(c, None, 128, 128, sp, seed=0, decode=False)


def test_unclip_config_factory():
    from mdu_tpu.models import sd21_unclip_unet_config

    assert sd21_unclip_unet_config("l").adm_in_channels == 1536
    assert sd21_unclip_unet_config("h").adm_in_channels == 2048
    assert sd21_unclip_unet_config().cross_attention_dim == 1024
