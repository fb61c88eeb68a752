from .mesh import make_tile_mesh, make_train_mesh, replicated
from .sharded import (make_sharded_tile_denoiser, shard_vae_tiles,
                      sharded_tiled_vae_decode, sharded_tiled_vae_encode_moments)
from .training import make_train_step, param_shardings

__all__ = [
    "make_tile_mesh", "make_train_mesh", "replicated",
    "make_sharded_tile_denoiser", "shard_vae_tiles",
    "sharded_tiled_vae_decode", "sharded_tiled_vae_encode_moments",
    "make_train_step", "param_shardings",
]
