"""uint8-resident ControlNet hint canvases (large-canvas HBM staging).

TPU-native analogue of the reference's optional CPU hint staging
(ref abstractdiffusion.py:504-505): instead of bouncing per-tile hints
host<->device each step, big hint canvases stay HBM-resident as uint8
(lossless — hints originate as uint8 images) and dequantize per tile
inside jit.  See tiling/conds.py::quantize_control_hints.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import (
    AutoencoderKL,
    ControlNet,
    UNet2DCondition,
    random_params,
    tiny_unet_config,
    tiny_vae_config,
)
from mdu_tpu.tiling.conds import dequantize_hint, quantize_control_hints


def test_quantize_thresholds(monkeypatch):
    small = jnp.ones((1, 3, 128, 128)) * 0.5
    big = jnp.ones((1, 3, 2048, 2048)) * 0.5
    monkeypatch.delenv("MDU_HINT_UINT8", raising=False)
    c = quantize_control_hints({"crossattn": jnp.zeros((1, 7, 16)),
                                "control": [small, big]})
    assert c["control"][0].dtype == jnp.float32        # below 2048^2
    assert c["control"][1].dtype == jnp.uint8
    monkeypatch.setenv("MDU_HINT_UINT8", "1")
    c = quantize_control_hints({"control": [small]})
    assert c["control"][0].dtype == jnp.uint8
    monkeypatch.setenv("MDU_HINT_UINT8", "0")
    c = quantize_control_hints({"control": [big]})
    assert c["control"][0].dtype == jnp.float32


def test_quantize_walks_and_branches(monkeypatch):
    monkeypatch.setenv("MDU_HINT_UINT8", "1")
    hint = jnp.ones((1, 3, 64, 64)) * (37.0 / 255.0)
    cond = {"__and__": [{"crossattn": jnp.zeros((1, 7, 16)), "control": [hint]},
                        {"crossattn": jnp.zeros((1, 7, 16))}],
            "__weights__": (1.0, 0.5)}
    q = quantize_control_hints(cond)
    h = q["__and__"][0]["control"][0]
    assert h.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(h), np.full((1, 3, 64, 64), 37, np.uint8))
    # dequantization round-trips the 1/255 grid exactly
    np.testing.assert_allclose(np.asarray(dequantize_hint(h)),
                               np.asarray(hint), atol=1e-7)
    assert q["__weights__"] == (1.0, 0.5)


def test_uint8_hints_match_f32_through_pipeline(monkeypatch):
    """End-to-end: quantized hints give the same result as f32 hints when
    the hint values lie on the uint8 grid (the lossless case — hints come
    from PNG images)."""
    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.pipeline import DiffusionPipeline

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    cn = ControlNet(cfg)
    z = jnp.zeros((1, 4, 16, 16))
    up = random_params(unet, 0, z, jnp.zeros((1,)), jnp.zeros((1, 7, 16)))
    cp = random_params(cn, 1, z, jnp.zeros((1,)), jnp.zeros((1, 7, 16)),
                       jnp.ones((1, 3, 128, 128)))
    cp = jax.tree.map(lambda x: x + 0.01, cp)
    vae = AutoencoderKL(tiny_vae_config())
    vp = random_params(vae, 2, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))

    rng = np.random.default_rng(5)
    hint_u8 = rng.integers(0, 256, (1, 3, 128, 256), np.uint8)
    hint_f32 = jnp.asarray(hint_u8.astype(np.float32) / 255.0)
    ca = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, tile_bs=2)
    sp = SamplerConfig(steps=2)

    monkeypatch.setenv("MDU_HINT_UINT8", "0")
    pipe = DiffusionPipeline(unet, up, vae, vp, controlnet=cn, controlnet_params=cp)
    a = pipe.txt2img({"crossattn": ca, "control": [hint_f32]}, None, 256, 128,
                     sp, seed=1, tiled_diffusion=td, decode=False)

    monkeypatch.setenv("MDU_HINT_UINT8", "1")
    pipe = DiffusionPipeline(unet, up, vae, vp, controlnet=cn, controlnet_params=cp)
    b = pipe.txt2img({"crossattn": ca, "control": [hint_f32]}, None, 256, 128,
                     sp, seed=1, tiled_diffusion=td, decode=False)
    # values match up to reassociation noise: the /255 dequant sits inside
    # the jitted graph on path b, so XLA fuses the hint chain differently
    np.testing.assert_allclose(np.asarray(a.latents), np.asarray(b.latents),
                               atol=1e-4, rtol=1e-4)
    # passing the uint8 canvas directly is equivalent (and what the CLI does)
    c = pipe.txt2img({"crossattn": ca, "control": [jnp.asarray(hint_u8)]}, None,
                     256, 128, sp, seed=1, tiled_diffusion=td, decode=False)
    np.testing.assert_allclose(np.asarray(b.latents), np.asarray(c.latents),
                               atol=1e-6, rtol=1e-6)
