"""Region-config round-trips: editor JSON -> regions_from_json, and PNG
metadata -> recovered regions with *resolved* seeds (VERDICT item 9;
ref javascript/bboxHint.js:171-221 getSeedInfo)."""
import json
import re

import jax
import jax.numpy as jnp
import numpy as np

from mdu_tpu.config import (
    SamplerConfig,
    TiledDiffusionConfig,
    regions_from_json,
    regions_from_png_info,
    regions_to_json,
)
from mdu_tpu.utils.bbox import BlendMode, RegionSpec


def test_editor_export_format_parses():
    """The exact payload shape tools/region_editor.html emits (its export
    handler mirrors regions_to_json) must parse via regions_from_json."""
    editor_payload = {
        "Region 1": {"x": 0.3, "y": 0.3, "w": 0.3, "h": 0.3, "prompt": "a cat",
                     "neg_prompt": "", "blend_mode": "Background",
                     "feather_ratio": 0.2, "seed": -1},
        "Region 2": {"x": 0.6, "y": 0.1, "w": 0.25, "h": 0.5, "prompt": "a dog",
                     "neg_prompt": "blurry", "blend_mode": "Foreground",
                     "feather_ratio": 0.35, "seed": 1234},
    }
    regions = regions_from_json(json.dumps(editor_payload))
    assert len(regions) == 2
    assert regions[0].blend_mode == BlendMode.BACKGROUND
    assert regions[1].blend_mode == BlendMode.FOREGROUND
    assert regions[1].seed == 1234 and regions[1].prompt == "a dog"
    # and the editor can re-load what we serialize (same schema)
    again = regions_from_json(regions_to_json(regions))
    assert again == regions


def test_editor_html_fields_match_schema():
    """The editor's export JS emits exactly the keys regions_from_json
    consumes — guard the HTML against schema drift."""
    html = open("tools/region_editor.html", encoding="utf-8").read()
    for key in ("x:", "y:", "w:", "h:", "prompt:", "neg_prompt:",
                "blend_mode:", "feather_ratio:", "seed:"):
        assert re.search(re.escape(key), html), f"editor export lost {key}"
    assert "Region ${i+1}" in html
    # the PNG import path exists and targets the right metadata block
    assert "readPngParameters" in html
    assert "Region control" in html and "parameters" in html


def test_png_metadata_seed_recovery(tmp_path):
    """Generate with regions -> save PNG -> recover regions with resolved
    seeds from the metadata (the -1 random seed becomes a concrete int)."""
    from mdu_tpu.cli import _save
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, random_params,
                                tiny_unet_config, tiny_vae_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    regions = (RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=-1),
               RegionSpec(0.5, 0.0, 0.5, 1.0, "right", seed=777))
    td = TiledDiffusionConfig(tile_w=16, tile_h=16, overlap=8, regions=regions)
    cond = {"crossattn": jnp.zeros((1, 7, 16))}
    rc = [(cond, None), (cond, None)]
    res = pipe.txt2img(cond, None, 256, 128, SamplerConfig(steps=2), seed=5,
                       tiled_diffusion=td, region_conds=rc, decode=True)

    out = tmp_path / "gen.png"
    _save(res.images, str(out), res.info)

    from PIL import Image

    info = json.loads(Image.open(out).text["parameters"])
    recovered = regions_from_png_info(info)
    assert len(recovered) == 2
    assert recovered[0].seed >= 0, "random -1 seed must come back resolved"
    assert recovered[1].seed == 777
    assert recovered[0].prompt == "left" and recovered[1].prompt == "right"
    # recovered geometry matches what was drawn
    assert abs(recovered[0].w - 0.5) < 1e-6 and abs(recovered[1].x - 0.5) < 1e-6


def test_png_info_without_regions():
    assert regions_from_png_info({"Sampler": "Euler"}) == []


def test_styles_csv_application(tmp_path):
    """A1111 styles.csv: {prompt} substitution, plain append, negatives
    (ref Prompt.apply_styles, tile_utils/utils.py:106-109)."""
    from mdu_tpu.text.prompt import apply_styles, load_styles

    csv_file = tmp_path / "styles.csv"
    csv_file.write_text(
        'name,prompt,negative_prompt\n'
        'cinematic,"{prompt}, cinematic lighting, 35mm","grainy"\n'
        'anime,"anime style",""\n', encoding="utf-8")
    table = load_styles(str(csv_file))
    assert set(table) == {"cinematic", "anime"}

    p, n = apply_styles("a cat", "ugly", ["cinematic"], table)
    assert p == "a cat, cinematic lighting, 35mm"
    assert n == "ugly, grainy"
    p, n = apply_styles("a cat", "", ["anime"], table)
    assert p == "a cat, anime style" and n == ""
    p, n = apply_styles("a cat", "", ["cinematic", "anime"], table)
    assert p == "a cat, cinematic lighting, 35mm, anime style"
