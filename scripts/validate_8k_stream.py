"""On-metal validation of the fp8 streaming-VAE spill at 8K (ROADMAP r5 #4).

Runs the stream-host exact decoder on an 8192px-output latent twice —
bf16 spills (baseline) vs float8_e4m3fn spills — and reports wall time,
Mpix/s, and mean |rel| difference between the two outputs.  The fp8 mode
halves inter-segment host<->device transport (the PCIe/relay lever,
docs/TUNING.md); parity at <=4K and on CPU is already test-pinned
(tests/test_tiled_vae.py::test_streaming_fp8_spill_close_to_exact) — this
script is the 8K on-chip check.

    python scripts/validate_8k_stream.py [--size 8192] [--tile 96]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/mdu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=8192, help="output px side")
    ap.add_argument("--tile", type=int, default=96, help="latent tile side")
    args = ap.parse_args()

    from mdu_tpu.models import AutoencoderKL, VAEConfig, random_params
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    dt = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    lat_side = args.size // 8
    z = (np.random.default_rng(0).standard_normal(
        (1, 4, lat_side, lat_side)).astype(np.float32) * 0.7)
    mpix = args.size * args.size / 1e6

    outs = {}
    for sd in (None, "float8_e4m3fn"):
        label = sd or "bf16"
        t0 = time.time()
        out = streaming_tiled_vae(vae, vp, jnp.asarray(z, dt), "decoder",
                                  tile_size=args.tile, host_resident=True,
                                  spill_dtype=sd)
        out = np.asarray(out, np.float32)
        dtm = time.time() - t0
        outs[label] = out
        print(f"spill={label}: {dtm:.1f}s = {mpix / dtm:.2f} Mpix/s "
              f"(first pass incl. compile)", flush=True)
        t0 = time.time()
        out2 = streaming_tiled_vae(vae, vp, jnp.asarray(z, dt), "decoder",
                                   tile_size=args.tile, host_resident=True,
                                   spill_dtype=sd)
        np.asarray(out2)
        dtm = time.time() - t0
        print(f"spill={label}: {dtm:.1f}s = {mpix / dtm:.2f} Mpix/s (warm)",
              flush=True)

    a, b = outs["bf16"], outs["float8_e4m3fn"]
    denom = np.abs(a).mean() + 1e-6
    print(f"mean |d|/mean|bf16| = {np.abs(a - b).mean() / denom:.4f} "
          f"(max |d| {np.abs(a - b).max():.4f})")


if __name__ == "__main__":
    main()
