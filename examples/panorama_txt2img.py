"""Benchmark config 2: MultiDiffusion 2048x512 panorama (BASELINE.md).

    python examples/panorama_txt2img.py --model-dir /ckpts/sd15
"""
import argparse

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
from mdu_tpu.models.loader import load_pipeline
from mdu_tpu.utils.telemetry import perfcount

ap = argparse.ArgumentParser()
ap.add_argument("--model-dir", required=True)
ap.add_argument("--prompt", default="a vast mountain panorama at golden hour")
ap.add_argument("--out", default="panorama.png")
args = ap.parse_args()

pipe, conditioner = load_pipeline(args.model_dir)
cond, uncond = conditioner.pair(args.prompt, "blurry, lowres", steps=20)

with perfcount("MultiDiffusion panorama"):
    res = pipe.txt2img(
        cond, uncond, width=2048, height=512,
        sampler=SamplerConfig(name="Euler", steps=20),
        seed=42,
        tiled_diffusion=TiledDiffusionConfig(method=Method.MULTI_DIFF),
        tiled_vae=TiledVAEConfig())

from PIL import Image
Image.fromarray(res.images[0]).save(args.out)
print("saved", args.out, res.info)
