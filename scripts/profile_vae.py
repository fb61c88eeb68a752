"""Tiled-VAE decode/encode attribution on the real TPU.

The panorama bench spends ~0.42 s decoding a 1 Mpix image — ~4x the
decoder's compute/bandwidth floor.  Times the tiled decode, the monolithic
decode, and the mid-block attention in isolation to attribute the gap.

    python scripts/profile_vae.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/mdu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timeit(f, *args, n=5):
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def main():
    from mdu_tpu.config import TiledVAEConfig
    from mdu_tpu.models import AutoencoderKL, VAEConfig, random_params
    from mdu_tpu.pipeline import DiffusionPipeline
    from mdu_tpu.models import UNet2DCondition, sd15_unet_config

    dt = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    unet = UNet2DCondition(sd15_unet_config(), dtype=dt)
    up = jax.tree.map(lambda a: a.astype(dt),
                      random_params(unet, 0, jnp.zeros((1, 4, 8, 8)),
                                    jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    pipe = DiffusionPipeline(unet, up, vae, vp)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 64, 256), dt) * 0.2

    # 1. tiled decode as the bench runs it (decoder_tile_size=96)
    tv = TiledVAEConfig(decoder_tile_size=96, fast_decoder=False)
    d_tiled = timeit(lambda: pipe._decode(z, tv))
    print(f"tiled decode 2048x512 (tile 96): {d_tiled*1e3:.1f} ms", flush=True)

    # 2. larger tiles => fewer, bigger batches
    for ts in (128, 192, 256):
        tvx = TiledVAEConfig(decoder_tile_size=ts, fast_decoder=False)
        d = timeit(lambda: pipe._decode(z, tvx))
        print(f"tiled decode (tile {ts}): {d*1e3:.1f} ms", flush=True)

    # 3. monolithic decode (no tiling) — the floor
    dec = jax.jit(lambda p, z: vae.apply(p, z / vae.cfg.scaling_factor,
                                         method=vae.decode))
    d_mono = timeit(dec, vp, z)
    print(f"monolithic decode: {d_mono*1e3:.1f} ms", flush=True)

    # 4. mid-block attention at the decode resolution (single head, D=512)
    from mdu_tpu.ops.attention import multi_head_attention

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64 * 256, 512), dt)
    d_attn = timeit(jax.jit(lambda x: multi_head_attention(x, x, x, 1)), x)
    print(f"VAE mid attention [1,16384,512]: {d_attn*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
