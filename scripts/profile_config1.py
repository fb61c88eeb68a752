"""Config-1 exact tiled-VAE decode floor attribution (VERDICT r4 item 4).

BENCH_r04 recorded 1.71 Mpix/s device-side for the exact lockstep decode of
a 2048^2 image at decoder tile 64 — 5.5x slower than the fast path on the
same hardware, and the cost was never broken down.  This script times, on
the real chip, device-side with per-iteration forcing:

  1. exact lockstep decode at tiles 64 / 96 / 128  (halo + lockstep scaling)
  2. fast decode at the same tiles                  (isolates exact-stat cost)
  3. monolithic decode                              (the no-tiling floor)

and prints the analytic lockstep HBM footprint next to each config so the
numbers can be read against the ~11 GiB budget (the footprint *shrinks* with
bigger tiles: fewer tiles -> less halo, tiled_vae.lockstep_footprint_bytes).

    python scripts/profile_config1.py [--size 2048] [--reps 3]
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


def force(x):
    """Materialize one element (axon's block_until_ready returns early)."""
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiles", type=int, nargs="+", default=[64, 96, 128])
    ap.add_argument("--skip-mono", action="store_true")
    args = ap.parse_args()

    from mdu_tpu.models import AutoencoderKL, VAEConfig, random_params
    from mdu_tpu.tiling.tiled_vae import (
        DECODER_PAD, lockstep_footprint_bytes, plan_vae_tiles,
        tiled_vae_decode,
    )

    dt = jnp.bfloat16
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    lat = args.size // 8
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4, lat, lat)).astype(np.float32) * 0.7, dt)
    mpix = args.size * args.size / 1e6

    def timed(fn, label):
        t0 = time.time()
        out = fn()
        force(out)
        print(f"  {label} compile+1st: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn()
            force(out)                 # per-iter: async stacking OOMs
        dtm = (time.time() - t0) / args.reps
        print(f"  {label}: {dtm:.2f}s = {mpix/dtm:.2f} Mpix/s (device)",
              flush=True)
        return mpix / dtm

    results = {}
    for ts in args.tiles:
        plan = plan_vae_tiles(lat, lat, ts, DECODER_PAD)
        nt = plan.num_tiles if plan is not None else 1
        fb = lockstep_footprint_bytes("decoder", ts, nt, 1) / 2**30
        print(f"tile {ts}: {nt} tiles, lockstep footprint ~{fb:.1f} GiB",
              flush=True)
        for fast in (False, True):
            lbl = f"{'fast ' if fast else 'exact'} t{ts}"
            try:
                results[lbl] = timed(
                    lambda ts=ts, fast=fast: tiled_vae_decode(
                        vae, vp, z, tile_size=ts, fast=fast), lbl)
            except Exception as e:                     # OOM -> keep going
                print(f"  {lbl}: FAILED {type(e).__name__}: {e}", flush=True)

    if not args.skip_mono:
        dec = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
        try:
            results["monolithic"] = timed(lambda: dec(vp, z), "monolithic")
        except Exception as e:
            print(f"  monolithic: FAILED {type(e).__name__}: {e}", flush=True)

    print({k: round(v, 2) for k, v in results.items()}, flush=True)


if __name__ == "__main__":
    main()
