"""Benchmark config 4: regional prompt control with background prompt."""
import argparse

from mdu_tpu.config import SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
from mdu_tpu.models.loader import load_pipeline
from mdu_tpu.utils.bbox import BlendMode, RegionSpec

ap = argparse.ArgumentParser()
ap.add_argument("--model-dir", required=True)
ap.add_argument("--out", default="regions.png")
args = ap.parse_args()

pipe, conditioner = load_pipeline(args.model_dir)
base = "a sunlit meadow, masterpiece"
regions = [
    RegionSpec(0.05, 0.2, 0.4, 0.7, "a red fox sitting", seed=101,
               blend_mode=BlendMode.FOREGROUND, feather_ratio=0.3),
    RegionSpec(0.55, 0.15, 0.4, 0.75, "an old oak tree", seed=202),
]
cond, uncond = conditioner.pair(base, "lowres", steps=20)
rc = [conditioner.region_pair(base, r.prompt, r.neg_prompt, "lowres", 20)
      for r in regions]

res = pipe.txt2img(cond, uncond, width=1536, height=1536,
                   sampler=SamplerConfig(steps=20), seed=5,
                   tiled_diffusion=TiledDiffusionConfig(regions=regions),
                   tiled_vae=TiledVAEConfig(), region_conds=rc)
from PIL import Image
Image.fromarray(res.images[0]).save(args.out)
print("saved", args.out, res.info["Tiled Diffusion"]["Region control"])
