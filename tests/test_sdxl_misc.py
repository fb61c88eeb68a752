"""SDXL conditioning path + checkpointing + extension-point cond slicing."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import (
    AutoencoderKL,
    CLIPTextModel,
    UNet2DCondition,
    random_params,
    tiny_clip_config,
    tiny_sdxl_unet_config,
    tiny_vae_config,
)
from mdu_tpu.text import TextConditioner
from mdu_tpu.text.sdxl import SDXLConditioner


def _tiny_te(hidden, proj=None, seed=0):
    cfg = dataclasses.replace(tiny_clip_config(), hidden_size=hidden,
                              num_heads=2, projection_dim=proj)
    m = CLIPTextModel(cfg)
    p = random_params(m, seed, jnp.zeros((1, cfg.max_length), jnp.int32))
    return TextConditioner(m, p)


def test_sdxl_cond_structure():
    sx = SDXLConditioner(_tiny_te(8, seed=0), _tiny_te(8, proj=16, seed=1))
    c = sx.cond("a castle", width=256, height=128)
    assert c["crossattn"].shape[-1] == 16          # 8 + 8 concat
    assert c["vector"].shape == (1, 16)            # projected pooled
    np.testing.assert_array_equal(
        np.asarray(c["time_ids"]), [[128, 256, 0, 0, 128, 256]])


def test_sdxl_pipeline_end_to_end():
    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_sdxl_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    sx = SDXLConditioner(_tiny_te(8, seed=0), _tiny_te(8, proj=16, seed=1))
    cond, uncond = sx.pair("a castle", "blurry", 256, 128)
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       cond["crossattn"][:, :7], {"text_embeds": cond["vector"],
                                                  "time_ids": cond["time_ids"]})
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, tile_bs=2)
    res = pipe.txt2img(cond, uncond, 256, 128, SamplerConfig(steps=2), seed=2,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_custom_spatial_cond_leaf_sliced_per_tile():
    """Extension point (StableSR-style per-tile guidance, ref
    abstractdiffusion.py:547-588): any canvas-shaped cond leaf is sliced per
    tile automatically."""
    from mdu_tpu.tiling.conds import tile_cond
    from mdu_tpu.utils.bbox import BBox

    guidance = jnp.arange(1 * 4 * 16 * 32, dtype=jnp.float32).reshape(1, 4, 16, 32)
    cond = {"crossattn": jnp.ones((1, 7, 16)), "stablesr_latent": guidance}
    bb = [BBox(0, 0, 16, 16), BBox(16, 0, 16, 16)]
    sliced = tile_cond(cond, bb, (16, 32))
    assert sliced["stablesr_latent"].shape == (2, 4, 16, 16)
    np.testing.assert_array_equal(np.asarray(sliced["stablesr_latent"][0]),
                                  np.asarray(guidance[0, :, :, 0:16]))
    np.testing.assert_array_equal(np.asarray(sliced["stablesr_latent"][1]),
                                  np.asarray(guidance[0, :, :, 16:32]))
    assert sliced["crossattn"].shape == (2, 7, 16)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from mdu_tpu.utils.checkpoint import load_params, save_params

    params = {"params": {"a": jnp.arange(6.0).reshape(2, 3),
                         "b": {"c": jnp.ones((4,))}}}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    got = load_params(path, jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params))
    np.testing.assert_array_equal(np.asarray(got["params"]["a"]),
                                  np.asarray(params["params"]["a"]))


def test_check_finite_raises():
    from mdu_tpu.utils.checkpoint import check_finite

    check_finite(jnp.ones((2, 2)))
    with pytest.raises(FloatingPointError):
        check_finite(jnp.asarray([1.0, float("nan")]), "latents")
