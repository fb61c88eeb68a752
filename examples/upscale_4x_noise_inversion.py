"""Benchmark config 3: Mixture-of-Diffusers x4 img2img upscale with
gaussian blending + tiled noise inversion (BASELINE.md)."""
import argparse

import numpy as np
from PIL import Image

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
from mdu_tpu.models.loader import load_pipeline
from mdu_tpu.utils.telemetry import perfcount

ap = argparse.ArgumentParser()
ap.add_argument("--model-dir", required=True)
ap.add_argument("--init", required=True)
ap.add_argument("--prompt", default="highly detailed, 8k photo")
ap.add_argument("--out", default="upscaled.png")
args = ap.parse_args()

pipe, conditioner = load_pipeline(args.model_dir)
cond, uncond = conditioner.pair(args.prompt, "blurry", steps=20)
img = np.asarray(Image.open(args.init).convert("RGB"))

td = TiledDiffusionConfig(
    method=Method.MIX_DIFF, overlap=8,
    upscaler="Lanczos", scale_factor=4.0,
    noise_inverse=True, noise_inverse_steps=10,
    noise_inverse_renoise_strength=1.0)
tv = TiledVAEConfig(streaming=True)        # fixed-HBM exact VAE for big outputs

with perfcount("MoD x4 upscale"):
    res = pipe.img2img(img, cond, uncond,
                       sampler=SamplerConfig(steps=20, denoising_strength=0.4),
                       seed=7, tiled_diffusion=td, tiled_vae=tv)
Image.fromarray(res.images[0]).save(args.out)
print("saved", args.out)
