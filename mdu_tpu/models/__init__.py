from .controlnet import ControlNet
from .single_file import load_single_file
from .stablesr import StableSRGuidance, combine_residuals
from .esrgan import RRDBNet, RRDBNetConfig, load_esrgan, register_esrgan_upscaler
from .init_utils import random_params
from .loader import (
    convert_params,
    load_controlnet,
    load_guidance,
    load_pipeline,
    load_safetensors,
    translate_clip_name,
    translate_controlnet_name,
    translate_unet_name,
    translate_vae_name,
)
from .clip import (
    CLIPTextConfig,
    CLIPTextModel,
    clip_l_config,
    open_clip_bigg_config,
    open_clip_h_config,
    tiny_clip_config,
)
from .unet import (
    UNet2DCondition,
    UNetConfig,
    sd15_unet_config,
    sd21_unclip_unet_config,
    sd21_unet_config,
    sdxl_unet_config,
    tiny_sdxl_unet_config,
    tiny_unet_config,
)
from .vae import AutoencoderKL, Decoder, Encoder, VAEConfig, sample_from_moments, tiny_vae_config

__all__ = [
    "random_params", "ControlNet", "StableSRGuidance", "combine_residuals",
    "RRDBNet", "RRDBNetConfig", "load_esrgan", "register_esrgan_upscaler",
    "convert_params", "load_controlnet", "load_guidance",
    "load_pipeline", "load_safetensors", "load_single_file",
    "translate_clip_name", "translate_controlnet_name", "translate_unet_name",
    "translate_vae_name",
    "CLIPTextConfig", "CLIPTextModel", "clip_l_config", "open_clip_bigg_config",
    "open_clip_h_config", "tiny_clip_config",
    "UNet2DCondition", "UNetConfig", "sd15_unet_config", "sd21_unet_config",
    "sd21_unclip_unet_config",
    "sdxl_unet_config", "tiny_sdxl_unet_config", "tiny_unet_config",
    "AutoencoderKL", "Decoder", "Encoder", "VAEConfig", "sample_from_moments",
    "tiny_vae_config",
]
