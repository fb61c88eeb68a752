"""CLI ControlNet + StableSR-style guidance e2e (VERDICT r4 missing #1):
the reference drives its flagship ControlNet-tile upscaling from the UI
(ref tile_methods/abstractdiffusion.py:454-544, StableSR :547-588); here
the same workflows must be reachable from a shell command.
"""
import json

import numpy as np
import pytest
from PIL import Image

from mdu_tpu.models import tiny_clip_config, tiny_unet_config, tiny_vae_config

from synth_ckpt import (patch_tiny_configs, save_tiny_controlnet,
                        save_tiny_guidance, save_tiny_ldm_checkpoint)


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_adapters")
    ckpt = d / "tiny_sd.safetensors"
    save_tiny_ldm_checkpoint(ckpt, tiny_unet_config(), tiny_vae_config(),
                             tiny_clip_config())
    cn = d / "tiny_controlnet.safetensors"
    save_tiny_controlnet(cn, tiny_unet_config())
    gm = d / "tiny_guidance.safetensors"
    save_tiny_guidance(gm, tiny_unet_config())
    hint = d / "hint.png"
    Image.fromarray((np.random.default_rng(3).random((48, 96, 3)) * 255)
                    .astype(np.uint8)).save(hint)   # deliberately off-canvas
    init = d / "init.png"
    Image.fromarray((np.random.default_rng(4).random((64, 64, 3)) * 255)
                    .astype(np.uint8)).save(init)
    return {"ckpt": str(ckpt), "cn": str(cn), "gm": str(gm),
            "hint": str(hint), "init": str(init), "dir": d}


@pytest.fixture
def cli(monkeypatch):
    import mdu_tpu.cli as cli_mod

    patch_tiny_configs(monkeypatch, tiny_unet_config(), tiny_vae_config(),
                       tiny_clip_config())
    monkeypatch.setattr(cli_mod, "_install_sigint_watcher", lambda: None)
    return cli_mod.main


COMMON = ["--steps", "2", "--vae-decoder-tile", "8", "--vae-encoder-tile", "64",
          "--tile-width", "8", "--tile-height", "8", "--overlap", "4"]


def _img(path):
    return np.asarray(Image.open(path))


def _info(path):
    return json.loads(Image.open(path).text["parameters"])


def test_cli_txt2img_controlnet_steers(cli, paths, tmp_path):
    """Same seed with/without --controlnet must differ (the synthesized
    checkpoint has live gating convs), and the hint image is resized to
    the canvas (48x96 hint on a 64x128 generation)."""
    base, ctrl = tmp_path / "base.png", tmp_path / "ctrl.png"
    argv = ["txt2img", "--model-dir", paths["ckpt"], "--prompt", "a cat",
            "-W", "128", "-H", "64", "--seed", "7"] + COMMON
    cli(argv + ["--out", str(base)])
    cli(argv + ["--controlnet", paths["cn"], "--control-image", paths["hint"],
                "--out", str(ctrl)])
    a, b = _img(base), _img(ctrl)
    assert a.shape == b.shape == (64, 128, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0
    info = _info(ctrl)
    assert info["ControlNet"]["model"] == paths["cn"]
    assert info["ControlNet"]["weight"] == 1.0


def test_cli_txt2img_controlnet_requires_hint(cli, paths, tmp_path):
    with pytest.raises(SystemExit):
        cli(["txt2img", "--model-dir", paths["ckpt"], "--prompt", "x",
             "-W", "64", "-H", "64", "--controlnet", paths["cn"],
             "--out", str(tmp_path / "x.png")] + COMMON)


def test_cli_img2img_controlnet_defaults_to_init(cli, paths, tmp_path):
    """The ControlNet-tile upscale workflow: no --control-image means the
    init image is the hint (ref workflow: hint == upscaled input)."""
    base, ctrl = tmp_path / "b.png", tmp_path / "c.png"
    argv = ["img2img", "--model-dir", paths["ckpt"], "--prompt", "up",
            "--init", paths["init"], "--scale-factor", "2",
            "--upscaler", "Lanczos", "--denoising-strength", "0.6",
            "--seed", "3"] + COMMON
    cli(argv + ["--out", str(base)])
    cli(argv + ["--controlnet", paths["cn"], "--control-weight", "0.8",
                "--out", str(ctrl)])
    a, b = _img(base), _img(ctrl)
    assert a.shape == b.shape == (128, 128, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0
    assert _info(ctrl)["ControlNet"]["image"] == paths["init"]


def test_cli_img2img_guidance_steers(cli, paths, tmp_path):
    base, gd = tmp_path / "b.png", tmp_path / "g.png"
    argv = ["img2img", "--model-dir", paths["ckpt"], "--prompt", "up",
            "--init", paths["init"], "--scale-factor", "2",
            "--upscaler", "Lanczos", "--denoising-strength", "0.6",
            "--seed", "3"] + COMMON
    cli(argv + ["--out", str(base)])
    cli(argv + ["--guidance-model", paths["gm"], "--out", str(gd)])
    a, b = _img(base), _img(gd)
    assert np.abs(a.astype(int) - b.astype(int)).max() > 0
    info = _info(gd)
    assert info["Guidance"]["model"] == paths["gm"]
    assert info["Guidance"]["image"] == paths["init"]


def test_cli_demofusion_controlnet(cli, paths, tmp_path):
    out = tmp_path / "df.png"
    cli(["demofusion", "--model-dir", paths["ckpt"], "--prompt", "x",
         "-W", "64", "-H", "64", "--scale", "2", "--window-size", "8",
         "--seed", "1", "--controlnet", paths["cn"],
         "--control-image", paths["hint"], "--out", str(out)] + COMMON)
    s2 = _img(tmp_path / "df_scale2.png")
    assert s2.shape == (128, 128, 3)
    assert _info(tmp_path / "df_scale2.png")["ControlNet"]["weight"] == 1.0


def test_load_controlnet_diffusers_folder(paths):
    """Folder layout: config.json architecture wins over the passed cfg."""
    import os

    from mdu_tpu.models import load_controlnet

    d = paths["dir"] / "cn_folder"
    os.makedirs(d, exist_ok=True)
    ucfg = tiny_unet_config()
    cfg_json = {
        "in_channels": ucfg.in_channels,
        "block_out_channels": list(ucfg.block_out_channels),
        "layers_per_block": ucfg.layers_per_block,
        "cross_attention_dim": ucfg.cross_attention_dim,
        "attention_head_dim": ucfg.num_heads,      # scalar <=16 => num heads
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "norm_num_groups": ucfg.norm_num_groups,
    }
    with open(d / "config.json", "w", encoding="utf-8") as f:
        json.dump(cfg_json, f)
    save_tiny_controlnet(d / "diffusion_pytorch_model.safetensors", ucfg)
    cn, params = load_controlnet(str(d))
    assert cn.cfg.block_out_channels == ucfg.block_out_channels
    import jax.numpy as jnp

    down, mid = cn.apply(params, jnp.zeros((1, ucfg.in_channels, 16, 16)),
                         jnp.zeros((1,)),
                         jnp.zeros((1, 7, ucfg.cross_attention_dim)),
                         jnp.zeros((1, 3, 128, 128)))
    assert mid.shape[1] == ucfg.block_out_channels[-1]
