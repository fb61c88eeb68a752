from .tiled_vae import (
    DECODER_PAD,
    ENCODER_PAD,
    VAETilePlan,
    plan_vae_tiles,
    tiled_vae_decode,
    tiled_vae_encode_moments,
)

__all__ = [
    "DECODER_PAD", "ENCODER_PAD", "VAETilePlan", "plan_vae_tiles",
    "tiled_vae_decode", "tiled_vae_encode_moments",
]
