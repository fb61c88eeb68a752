"""LoRA merging + per-region LoRA'd params + ControlNet through the pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from mdu_tpu.models import (
    AutoencoderKL,
    ControlNet,
    UNet2DCondition,
    random_params,
    tiny_unet_config,
    tiny_vae_config,
    translate_unet_name,
)
from mdu_tpu.models.lora import merge_lora


def _unet_and_params():
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    params = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                           jnp.zeros((1, 7, cfg.cross_attention_dim)))
    return unet, params


def test_merge_lora_kohya_format():
    unet, params = _unet_and_params()
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    name = "down_0_attn_0/block_0/attn1/to_q/weight"
    w = np.asarray(flat[name])
    out_dim, in_dim = w.shape
    r = 2
    rng = np.random.default_rng(0)
    down = rng.normal(size=(r, in_dim)).astype(np.float32)
    up = rng.normal(size=(out_dim, r)).astype(np.float32)
    base = translate_unet_name(name)[:-len(".weight")].replace(".", "_")
    state = {
        f"lora_unet_{base}.lora_down.weight": down,
        f"lora_unet_{base}.lora_up.weight": up,
        f"lora_unet_{base}.alpha": np.float32(r),
    }
    merged = merge_lora(params, state, scale=0.5)
    got = np.asarray(traverse_util.flatten_dict(merged["params"], sep="/")[name])
    np.testing.assert_allclose(got, w + 0.5 * up @ down, rtol=1e-5, atol=1e-6)
    # untouched params stay identical
    other = "down_0_res_0/conv1/weight"
    np.testing.assert_array_equal(
        np.asarray(traverse_util.flatten_dict(merged["params"], sep="/")[other]),
        np.asarray(flat[other]))


def test_merge_lora_no_match_is_noop():
    _, params = _unet_and_params()
    merged = merge_lora(params, {"lora_unet_nonexistent.lora_down.weight": np.zeros((2, 4))}, 1.0)
    assert merged is params or jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), merged, params))


def test_per_region_lora_changes_region_only():
    from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.pipeline import DiffusionPipeline
    from mdu_tpu.utils.bbox import RegionSpec

    unet, up = _unet_and_params()
    vae = AutoencoderKL(tiny_vae_config())
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16)) * 0.1}
    regions = [RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=1)]
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, regions=regions)
    # locality is per-step: with >1 steps tiles straddling the region
    # boundary propagate the change outward, so test a single step
    sp = SamplerConfig(steps=1)
    rc = [(cond, None)]

    a = pipe.txt2img(cond, None, 256, 128, sp, seed=3, tiled_diffusion=td,
                     region_conds=rc, decode=False)
    # perturb region params noticeably
    up2 = jax.tree.map(lambda x: x * 1.5, up)
    b = pipe.txt2img(cond, None, 256, 128, sp, seed=3, tiled_diffusion=td,
                     region_conds=rc, region_unet_params=[up2], decode=False)
    la, lb = np.asarray(a.latents), np.asarray(b.latents)
    # region occupies left half (x < 16 latent)
    assert np.abs(la[:, :, :, :16] - lb[:, :, :, :16]).max() > 1e-4
    np.testing.assert_allclose(la[:, :, :, 16:], lb[:, :, :, 16:], atol=1e-5)


def test_controlnet_through_pipeline():
    from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.pipeline import DiffusionPipeline

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    cn = ControlNet(cfg)
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, 16)))
    hint = jnp.ones((1, 3, 128, 256))
    cp = random_params(cn, 1, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, 16)), jnp.ones((1, 3, 128, 128)))
    # give the zero convs real values so the hint has an effect
    cp = jax.tree.map(lambda x: x + 0.01, cp)
    vae = AutoencoderKL(tiny_vae_config())
    vp = random_params(vae, 2, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp, controlnet=cn, controlnet_params=cp)

    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16)) * 0.1,
            "control": [hint]}
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, tile_bs=2)
    res = pipe.txt2img(cond, None, 256, 128, SamplerConfig(steps=2), seed=1,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()

    cond2 = {"crossattn": cond["crossattn"]}
    pipe2 = DiffusionPipeline(unet, up, vae, vp)
    res2 = pipe2.txt2img(cond2, None, 256, 128, SamplerConfig(steps=2), seed=1,
                         tiled_diffusion=td, decode=False)
    # the hint must influence the result
    assert np.abs(np.asarray(res.latents) - np.asarray(res2.latents)).max() > 1e-5


def test_cli_prompt_network_tags(tmp_path, capsys):
    """<lora:name:w> tags resolve from lora-dir and merge; unknown names and
    non-lora kinds warn and are skipped (CLI surface glue for
    text/prompt.extract_networks)."""
    import argparse
    import sys

    import numpy as np
    from safetensors.numpy import save_file

    from mdu_tpu.cli import _apply_prompt_networks

    rng = np.random.default_rng(0)
    down, up = rng.normal(size=(2, 8)).astype(np.float32), \
        rng.normal(size=(8, 2)).astype(np.float32)
    (tmp_path / "loras").mkdir()
    save_file({"lora_unet_conv_in.lora_down.weight": down,
               "lora_unet_conv_in.lora_up.weight": up},
              str(tmp_path / "loras" / "style.safetensors"))

    class Pipe:
        unet_params = {"params": {"conv_in": {
            "weight": jnp.zeros((8, 8)), "bias": jnp.zeros((8,))}}}

    pipe = Pipe()
    args = argparse.Namespace(
        prompt="a cat <lora:style:0.5> <lora:nope:1> <hypernet:h:1>",
        negative="", model_dir=str(tmp_path), lora_dir=None)
    _apply_prompt_networks(pipe, args)
    err = capsys.readouterr().err
    assert "merging <lora:style:0.5>" in err
    assert "LoRA 'nope' not found" in err
    assert "<hypernet:h> networks are not supported" in err
    expect = 0.5 * (up @ down)
    np.testing.assert_allclose(
        np.asarray(pipe.unet_params["params"]["conv_in"]["weight"]),
        expect, atol=1e-6)
