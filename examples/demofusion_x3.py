"""DemoFusion x3 progressive upscale (ref tileglobal.py demo)."""
import argparse

from mdu_tpu.config import DemoFusionConfig, SamplerConfig
from mdu_tpu.models.loader import load_pipeline

ap = argparse.ArgumentParser()
ap.add_argument("--model-dir", required=True)
ap.add_argument("--prompt", default="portrait photo of an astronaut")
ap.add_argument("--out", default="demofusion.png")
args = ap.parse_args()

pipe, conditioner = load_pipeline(args.model_dir)
cond, uncond = conditioner.pair(args.prompt, "blurry", steps=20)
res = pipe.demofusion(cond, uncond, width=1024, height=1024,
                      cfg=DemoFusionConfig(scale_factor=3, mixture=True),
                      sampler=SamplerConfig(steps=20), seed=1)
from PIL import Image
for i, imgs in enumerate(res.images):
    Image.fromarray(imgs[0]).save(args.out.replace(".png", f"_scale{i+1}.png"))
print("saved all scales")
