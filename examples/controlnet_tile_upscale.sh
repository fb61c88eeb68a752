#!/bin/sh
# ControlNet-tile guided 4x upscale — the reference's flagship workflow
# (ref README.md:48-60; tile_methods/abstractdiffusion.py:454-544), from a
# shell command (config-5-shaped: swap in an SDXL checkpoint + DemoFusion
# for the full BASELINE config 5).
#
# Checkpoints:
#   $MODEL      diffusers folder or single .safetensors (SD-1.5 class)
#   $CONTROLNET diffusers-layout ControlNet folder or .safetensors with
#               diffusers keys (e.g. control_v11f1e_sd15_tile converted
#               via diffusers' convert script)
#
# The hint image defaults to the init image — exactly the ControlNet-tile
# recipe: the upscaled input conditions every tile so high-frequency
# detail is invented without drifting from the low-res content.
set -e
MODEL=${MODEL:-/ckpt/sd15}
CONTROLNET=${CONTROLNET:-/ckpt/controlnet-tile}

PYTHONPATH=$(dirname "$0")/.. python -m mdu_tpu.cli img2img \
  --model-dir "$MODEL" \
  --controlnet "$CONTROLNET" --control-weight 1.0 \
  --init input.png \
  --upscaler Lanczos --scale-factor 4 \
  --denoising-strength 0.4 \
  --method "Mixture of Diffusers" --overlap 8 \
  --noise-inverse --noise-inverse-steps 10 \
  --steps 20 --cfg-scale 7 --bf16 \
  --out upscaled_4x.png

# StableSR-style structure guidance instead of (or alongside) ControlNet:
#   ... --guidance-model guidance.safetensors --guidance-strength 1.0
# (weights in the mdu_tpu flat layout; see scripts/export_params.py)
