"""Benchmark: SD-1.5 MultiDiffusion txt2img 2048x512 panorama, 20 steps
(BASELINE.md config 2) + tiled VAE decode, on one TPU chip, bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6).
Baseline estimate for the same workload on the reference stack (A1111 +
MultiDiffusion extension, A100 80GB, xformers, fp16): ~10 s/image => 6
images/min — from the reference's own telemetry format (tilevae.py:264-284)
applied to community-reported panorama timings.  vs_baseline = ours / 6.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/mdu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BASELINE_IMG_PER_MIN = 6.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _watchdog(seconds=None):
    """Exit(1) if the device never comes up (dead tunnel) — a clear failure
    beats an infinite hang for the round driver."""
    import os
    import threading

    if seconds is None:
        seconds = int(os.environ.get("BENCH_WATCHDOG_SECS", "1200"))
    state = {"alive": False}

    def probe():
        jnp.ones((8, 8)).block_until_ready()
        state["alive"] = True

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(seconds)
    if not state["alive"]:
        log(f"bench watchdog: device unreachable after {seconds}s — aborting")
        os._exit(1)


def main():
    from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
    from mdu_tpu.models import (
        AutoencoderKL, UNet2DCondition, VAEConfig, random_params, sd15_unet_config,
    )
    from mdu_tpu.pipeline import DiffusionPipeline

    _watchdog()
    dev = jax.devices()[0]
    log(f"bench device: {dev}")
    dtype = jnp.bfloat16

    ucfg = sd15_unet_config()
    unet = UNet2DCondition(ucfg, dtype=dtype)
    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg, dtype=dtype)

    t0 = time.time()
    up = random_params(unet, 0, jnp.zeros((1, 4, 8, 8)), jnp.zeros((1,)),
                       jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    up = jax.tree.map(lambda a: a.astype(dtype), up)
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    vp = jax.tree.map(lambda a: a.astype(dtype), vp)
    log(f"params built in {time.time()-t0:.1f}s")

    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), dtype) * 0.1}
    uncond = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768), dtype) * 0.1}

    td = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=96, tile_h=96,
                              overlap=48, tile_bs=8)
    tv = TiledVAEConfig(decoder_tile_size=96, fast_decoder=False, fast_encoder=False)
    sp = SamplerConfig(name="Euler", steps=20, cfg_scale=7.0)

    def run(seed):
        return pipe.txt2img(cond, uncond, width=2048, height=512, sampler=sp,
                            seed=seed, tiled_diffusion=td, tiled_vae=tv)

    t0 = time.time()
    res = run(0)                      # compile + first image
    log(f"first image (incl. compile): {time.time()-t0:.1f}s, out {res.images.shape}")

    n = 3
    t0 = time.time()
    for i in range(1, n + 1):
        res = run(i)
    dt = (time.time() - t0) / n
    img_per_min = 60.0 / dt
    log(f"steady-state: {dt:.2f}s/image")

    # secondary metric: tiled-VAE decode throughput (stderr only)
    try:
        z = res.latents
        img = pipe._decode(z, tv)
        t0 = time.time()
        for _ in range(3):
            img = pipe._decode(z, tv)
        ddt = (time.time() - t0) / 3
        mpix = img.shape[1] * img.shape[2] / 1e6
        log(json.dumps({"metric": "tiled_vae_decode_2048x512",
                        "value": round(mpix / ddt, 2), "unit": "Mpix/s"}))
    except Exception as e:
        log("vae secondary metric failed:", e)

    print(json.dumps({
        "metric": "sd15_multidiffusion_txt2img_2048x512_20steps",
        "value": round(img_per_min, 3),
        "unit": "images/min/chip",
        "vs_baseline": round(img_per_min / BASELINE_IMG_PER_MIN, 3),
    }))


if __name__ == "__main__":
    main()
