from .streaming_vae import streaming_tiled_vae
from .tiled_vae import (
    DECODER_PAD,
    ENCODER_PAD,
    VAETilePlan,
    plan_vae_tiles,
    tiled_vae_decode,
    tiled_vae_encode_moments,
)

__all__ = [
    "streaming_tiled_vae",
    "DECODER_PAD", "ENCODER_PAD", "VAETilePlan", "plan_vae_tiles",
    "tiled_vae_decode", "tiled_vae_encode_moments",
]
