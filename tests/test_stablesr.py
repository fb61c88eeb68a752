"""StableSR-style latent-image guidance (ref abstractdiffusion.py:547-588):
the guidance leaf rides the cond pytree, slices per tile/region, and steers
the UNet through zero-conv residuals."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig
from mdu_tpu.models import (
    AutoencoderKL,
    StableSRGuidance,
    UNet2DCondition,
    random_params,
    tiny_unet_config,
    tiny_vae_config,
)
from mdu_tpu.pipeline import DiffusionPipeline


@pytest.fixture(scope="module")
def guided_pipe():
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    gm = StableSRGuidance(ucfg)
    gp = random_params(gm, 2, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)))
    # zero convs start at 0 -> perturb so guidance actually flows
    from flax import traverse_util
    flat = traverse_util.flatten_dict(gp["params"], sep="/")
    for k in flat:
        if k.startswith("zero") and k.endswith("weight"):
            flat[k] = jnp.ones_like(flat[k]) * 0.05
    gp = {"params": traverse_util.unflatten_dict(flat, sep="/")}
    return DiffusionPipeline(unet, up, vae, vp, guidance_model=gm,
                             guidance_params=gp)


def _cond(key, guidance=None, h=16, w=32):
    c = {"crossattn": jax.random.normal(jax.random.PRNGKey(key), (1, 7, 16)) * 0.1}
    if guidance is not None:
        c["guidance"] = guidance
    return c


TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2)
SP = SamplerConfig(steps=2)


def test_guidance_residual_shapes(guided_pipe):
    gm, gp = guided_pipe.guidance_model, guided_pipe.guidance_params
    down, mid = gm.apply(gp, jnp.zeros((2, 4, 16, 16)), jnp.zeros((2,)))
    # skip structure: conv_in + layers_per_block per level + downsamples
    cfg = guided_pipe.unet.cfg
    n_skips = 1 + len(cfg.block_out_channels) * cfg.layers_per_block \
        + (len(cfg.block_out_channels) - 1)
    assert len(down) == n_skips
    assert mid.shape[1] == cfg.block_out_channels[-1]


def test_guidance_changes_tiled_output(guided_pipe):
    """Same seed/conds, different guidance image => different output; the
    guidance leaf is canvas-shaped and sliced per tile."""
    g1 = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 16, 32)) * 0.3
    g2 = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 16, 32)) * 0.3
    u = _cond(1)
    a = guided_pipe.txt2img(_cond(0, g1), {**u, "guidance": g1}, 256, 128, SP,
                            seed=3, tiled_diffusion=TD, decode=False)
    b = guided_pipe.txt2img(_cond(0, g2), {**u, "guidance": g2}, 256, 128, SP,
                            seed=3, tiled_diffusion=TD, decode=False)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-5


def test_guidance_tiled_equals_untiled(guided_pipe):
    """Degenerate single-tile plan == no tiling, with guidance active
    (the per-tile guidance slice is then the whole canvas)."""
    g = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 16, 16)) * 0.3
    u = {**_cond(1), "guidance": g}
    td1 = dataclasses.replace(TD, tile_w=32, tile_h=32)
    a = guided_pipe.txt2img(_cond(0, g), u, 128, 128, SP, seed=3,
                            tiled_diffusion=td1, decode=False)
    b = guided_pipe.txt2img(_cond(0, g), u, 128, 128, SP, seed=3,
                            tiled_diffusion=None, decode=False)
    np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))


def test_guidance_sliced_per_region(guided_pipe):
    """Regions get their own guidance slice (ref switch_stablesr_tensors
    per custom bbox, abstractdiffusion.py:577-588)."""
    from mdu_tpu.utils.bbox import BlendMode, RegionSpec

    g = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 16, 32)) * 0.3
    regions = (RegionSpec(0.5, 0.0, 0.25, 0.5, blend_mode=BlendMode.FOREGROUND,
                          feather_ratio=0.3, seed=7),)
    td = dataclasses.replace(TD, regions=regions)
    rc = [(_cond(12, g), None)]
    res = guided_pipe.txt2img(_cond(0, g), {**_cond(1), "guidance": g},
                              256, 128, SP, seed=3, tiled_diffusion=td,
                              region_conds=rc, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
