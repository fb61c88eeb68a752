"""CLI end-to-end: drive ``mdu_tpu.cli.main(argv)`` in-process against a
synthesized tiny single-file checkpoint, asserting output PNGs and their
embedded metadata — the analogue of exercising the reference's Script
orchestration (ref scripts/tilediffusion.py:257-383 Script.process +
PNG-info round-trip, javascript/bboxHint.js:171-221 seed recovery)."""
import json

import numpy as np
import pytest
from PIL import Image

from mdu_tpu.models import tiny_clip_config, tiny_unet_config, tiny_vae_config

from synth_ckpt import patch_tiny_configs, save_tiny_ldm_checkpoint


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ckpt")
    p = d / "tiny_sd.safetensors"
    save_tiny_ldm_checkpoint(p, tiny_unet_config(), tiny_vae_config(),
                             tiny_clip_config())
    return str(p)


@pytest.fixture
def cli(monkeypatch):
    """Patched cli.main: tiny model configs, no SIGINT watcher (it blocks
    SIGINT process-wide, which must not leak into the test session)."""
    import mdu_tpu.cli as cli_mod

    patch_tiny_configs(monkeypatch, tiny_unet_config(), tiny_vae_config(),
                       tiny_clip_config())
    monkeypatch.setattr(cli_mod, "_install_sigint_watcher", lambda: None)
    return cli_mod.main


def _read_info(path) -> dict:
    img = Image.open(path)
    return json.loads(img.text["parameters"])


COMMON = ["--steps", "2", "--vae-decoder-tile", "8", "--vae-encoder-tile", "64",
          "--tile-width", "8", "--tile-height", "8", "--overlap", "4"]


def test_cli_txt2img(cli, ckpt_path, tmp_path):
    out = tmp_path / "t2i.png"
    cli(["txt2img", "--model-dir", ckpt_path, "--prompt", "a (test:1.2) scene",
         "--negative", "bad", "-W", "128", "-H", "64", "--seed", "7",
         "--out", str(out)] + COMMON)
    assert out.exists()
    img = np.asarray(Image.open(out))
    assert img.shape == (64, 128, 3)
    info = _read_info(out)
    assert info["Prompt"] == "a (test:1.2) scene"
    assert info["Seed"] == 7
    assert info["Tiled Diffusion"]["Method"] == "MultiDiffusion"


def test_cli_img2img_noise_inverse(cli, ckpt_path, tmp_path):
    init = tmp_path / "init.png"
    Image.fromarray((np.random.default_rng(0).random((64, 64, 3)) * 255)
                    .astype(np.uint8)).save(init)
    out = tmp_path / "i2i.png"
    cli(["img2img", "--model-dir", ckpt_path, "--prompt", "up", "--init",
         str(init), "--scale-factor", "2", "--upscaler", "Lanczos",
         "--denoising-strength", "0.6", "--noise-inverse",
         "--noise-inverse-steps", "2", "--method", "Mixture of Diffusers",
         "--seed", "3", "--out", str(out)] + COMMON)
    img = np.asarray(Image.open(out))
    assert img.shape == (128, 128, 3)          # x2 upscale
    info = _read_info(out)
    assert info["Tiled Diffusion"]["Method"] == "Mixture of Diffusers"
    assert info["Tiled Diffusion"]["NoiseInv"] is True


def test_cli_demofusion(cli, ckpt_path, tmp_path):
    out = tmp_path / "df.png"
    cli(["demofusion", "--model-dir", ckpt_path, "--prompt", "x",
         "-W", "64", "-H", "64", "--scale", "2", "--window-size", "8",
         "--seed", "1", "--out", str(out)] + COMMON)
    # every phase scale is emitted (ref tileglobal.py:240-253)
    s1 = np.asarray(Image.open(tmp_path / "df_scale1.png"))
    s2 = np.asarray(Image.open(tmp_path / "df_scale2.png"))
    assert s1.shape == (64, 64, 3)
    assert s2.shape == (128, 128, 3)
    info = _read_info(tmp_path / "df_scale2.png")
    assert info["DemoFusion"]["Scale factor"] == 2


def test_cli_vae_roundtrip(cli, ckpt_path, tmp_path):
    src = tmp_path / "src.png"
    Image.fromarray((np.random.default_rng(1).random((64, 64, 3)) * 255)
                    .astype(np.uint8)).save(src)
    out = tmp_path / "rt.png"
    cli(["vae-roundtrip", "--model-dir", ckpt_path, "--image", str(src),
         "--out", str(out)] + COMMON)
    img = np.asarray(Image.open(out))
    assert img.shape == (64, 64, 3)
    # --color-fix (ref tilevae.py:693) must be accepted and produce output
    out2 = tmp_path / "rt_cf.png"
    cli(["vae-roundtrip", "--model-dir", ckpt_path, "--image", str(src),
         "--out", str(out2), "--color-fix", "--fast-encoder"] + COMMON)
    assert np.asarray(Image.open(out2)).shape == (64, 64, 3)


def test_cli_region_png_recovery(cli, ckpt_path, tmp_path, capsys):
    """Regions JSON in -> generation -> recover regions (with RESOLVED
    seeds) from the output PNG -> reuse as --regions for a second run."""
    from mdu_tpu.config import regions_from_png_info

    regions = tmp_path / "regions.json"
    regions.write_text(json.dumps({
        "Region 1": {"x": 0.0, "y": 0.0, "w": 0.5, "h": 0.5,
                     "prompt": "left thing", "neg_prompt": "",
                     "blend_mode": "Background", "feather_ratio": 0.2,
                     "seed": -1},
        "Region 2": {"x": 0.5, "y": 0.5, "w": 0.5, "h": 0.5,
                     "prompt": "right thing", "neg_prompt": "",
                     "blend_mode": "Foreground", "feather_ratio": 0.2,
                     "seed": 42},
    }))
    out = tmp_path / "reg.png"
    cli(["txt2img", "--model-dir", ckpt_path, "--prompt", "base",
         "-W", "128", "-H", "128", "--seed", "5", "--regions", str(regions),
         "--out", str(out)] + COMMON)
    info = _read_info(out)
    rec = regions_from_png_info(info)
    assert len(rec) == 2
    assert rec[0].prompt == "left thing"
    assert rec[1].seed == 42
    assert rec[0].seed != -1                   # resolved, not the -1 wildcard

    # drive a second generation straight off the PNG metadata
    out2 = tmp_path / "reg2.png"
    cli(["txt2img", "--model-dir", ckpt_path, "--prompt", "base",
         "-W", "128", "-H", "128", "--seed", "5", "--regions", str(out),
         "--out", str(out2)] + COMMON)
    rec2 = regions_from_png_info(_read_info(out2))
    assert [r.seed for r in rec2] == [r.seed for r in rec]


def test_cli_info_command(cli, ckpt_path, tmp_path, capsys):
    out = tmp_path / "x.png"
    cli(["txt2img", "--model-dir", ckpt_path, "--prompt", "p", "-W", "64",
         "-H", "64", "--seed", "2", "--out", str(out)] + COMMON)
    capsys.readouterr()
    cli(["info", str(out)])
    printed = json.loads(capsys.readouterr().out)
    assert printed["Seed"] == 2


def test_cli_styles_file(cli, ckpt_path, tmp_path):
    """--style resolves through an A1111-format styles.csv (ref
    Prompt.apply_styles, tile_utils/utils.py:106-109)."""
    styles = tmp_path / "styles.csv"
    styles.write_text('name,prompt,negative_prompt\n'
                      'neat,"masterpiece, {prompt}","ugly"\n')
    out = tmp_path / "s.png"
    cli(["txt2img", "--model-dir", ckpt_path, "--prompt", "a cat",
         "--style", "neat", "--styles-file", str(styles),
         "-W", "64", "-H", "64", "--seed", "2", "--out", str(out)] + COMMON)
    info = _read_info(out)
    assert info["Prompt"] == "masterpiece, a cat"
    assert info["Negative prompt"] == "ugly"
