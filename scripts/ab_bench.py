"""A/B micro-harness for the TPU perf knobs (ROADMAP item 1).

Runs the panorama step (and optional kernels) under each flag combination
and prints a small table.  Requires the real TPU.

    python scripts/ab_bench.py            # full pipeline A/B
    python scripts/ab_bench.py --kernels  # kernel micro-benches only
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


def bench_kernels():
    from mdu_tpu.ops.groupnorm import group_norm
    from mdu_tpu.ops.pallas import flash_attention, fused_group_norm

    dt = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 640, 64, 96), dt)
    w = jnp.ones((640,))
    b = jnp.zeros((640,))

    def chain(f, x, n=50):
        def body(c, _):
            return f(c), None

        g = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0].sum())
        np.asarray(g(x))
        t0 = time.time()
        np.asarray(g(x))
        return (time.time() - t0) / n * 1e3

    from mdu_tpu.ops.groupnorm import group_norm_chanreduce

    for shape in [(16, 640, 64, 96), (16, 320, 96, 96), (16, 1280, 24, 24)]:
        xa = jax.random.normal(jax.random.PRNGKey(0), shape, dt)
        wa = jnp.ones((shape[1],))
        ba = jnp.zeros((shape[1],))
        t_xla = chain(lambda c: group_norm(c, 32, wa, ba).astype(dt), xa)
        t_cr = chain(lambda c: group_norm_chanreduce(c, 32, wa, ba).astype(dt), xa)
        mb = int(np.prod(shape)) * 2 / 2**20
        print(f"GN {shape} ({mb:.0f} MB): XLA {t_xla:.3f} ms | chanreduce {t_cr:.3f} ms",
              flush=True)
    print(f"group_norm pallas: {chain(lambda c: fused_group_norm(c, 32, w, b).astype(dt), x):.3f} ms")

    q = jax.random.normal(jax.random.PRNGKey(1), (16, 8, 6144, 64), dt)
    for bq, bk in [(256, 512), (512, 512), (512, 1024), (256, 2048)]:
        def fa(c, bq=bq, bk=bk):
            return flash_attention(c, q, q, block_q=bq, block_k=bk)

        ms = chain(fa, q, n=10)
        fl = 4 * 16 * 8 * 6144 * 6144 * 64
        print(f"flash bq={bq} bk={bk}: {ms:.2f} ms ({fl/ms/1e9:.0f} TFLOP/s)")


def bench_flash_t():
    """Lane-major vs transposed-layout flash attention at the real SD1.5
    level shapes (head dims 40/80/160 — none lane-aligned)."""
    from mdu_tpu.ops.pallas import flash_attention, flash_attention_t

    dt = jnp.bfloat16
    B = 16

    def chain(f, x, n=10):
        def body(c, _):
            return f(c), None

        g = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0].sum())
        np.asarray(g(x))
        t0 = time.time()
        np.asarray(g(x))
        return (time.time() - t0) / n * 1e3

    import functools

    from mdu_tpu.ops.pallas import flash_attention_t_fm

    for (H, L, D) in ((8, 9216, 40), (8, 2304, 80), (8, 576, 160), (8, 6144, 64)):
        q = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), dt)
        fl = 4 * B * H * L * L * D
        for name, fn in (("lane ", flash_attention), ("trans", flash_attention_t),
                         ("fm   ", flash_attention_t_fm),
                         ("fm16 ", functools.partial(flash_attention_t_fm,
                                                     bf16_exp=True))):
            for bq, bk in [(256, 512), (512, 1024), (512, 512)]:
                if bq > L or bk > L:
                    continue
                ms = chain(lambda c, fn=fn, bq=bq, bk=bk: fn(c, c, c, block_q=bq, block_k=bk), q)
                print(f"[{B},{H},{L},{D}] {name} bq={bq} bk={bk}: {ms:6.2f} ms "
                      f"({fl/ms/1e9:.0f} useful TFLOP/s)", flush=True)

    bench_xattn()


def bench_xattn():
    """Cross-attention A/B: long queries, 77 kv tokens (sdpa materializes
    the [B,H,L,77] fp32 score tensor in HBM; flash keeps it in VMEM).
    Round-2 verdict was sdpa; fm's cheaper softmax may flip it (ROADMAP
    round-4 item 3)."""
    from mdu_tpu.ops.attention import sdpa
    from mdu_tpu.ops.pallas import (flash_attention, flash_attention_t,
                                    flash_attention_t_fm)

    dt = jnp.bfloat16
    B = 16

    def chain(f, x, n=10):
        def body(c, _):
            return f(c), None

        g = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0].sum())
        np.asarray(g(x))
        t0 = time.time()
        np.asarray(g(x))
        return (time.time() - t0) / n * 1e3

    # SD1.5 cross-attn level shapes at tile_bs=8 x CFG2 (B.H rows of the
    # panorama program) plus SDXL's 2048-dim context heads
    for (H, L, D) in ((8, 9216, 40), (8, 6144, 40), (8, 2304, 80),
                      (8, 576, 160), (8, 1536, 80)):
        q = jax.random.normal(jax.random.PRNGKey(1), (B, H, L, D), dt)
        kv = jax.random.normal(jax.random.PRNGKey(2), (B, H, 77, D), dt)
        for name, fn in (("sdpa ", lambda a, b, c: sdpa(a, b, c)),
                         ("lane ", flash_attention),
                         ("trans", flash_attention_t),
                         ("fm   ", flash_attention_t_fm)):
            ms = chain(lambda c, fn=fn: fn(c, kv, kv), q)
            print(f"xattn [{B},{H},{L},{D}]x77 {name}: {ms:6.3f} ms", flush=True)


def bench_pipeline(flags):
    for k, v in flags.items():
        os.environ[k] = v
    # import after flags so dispatch sees them
    from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, VAEConfig,
                                random_params, sd15_unet_config)
    from mdu_tpu.pipeline import DiffusionPipeline

    from mdu_tpu.models.unet import default_unet_layout

    dt = jnp.bfloat16
    unet = UNet2DCondition(sd15_unet_config(), dtype=dt,
                           layout=default_unet_layout())
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    up = jax.tree.map(lambda a: a.astype(dt),
                      random_params(unet, 0, jnp.zeros((1, 4, 8, 8)),
                                    jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), dt) * 0.1}
    unc = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768), dt) * 0.1}
    td = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=96, tile_h=96,
                              overlap=48, tile_bs=8)
    sp = SamplerConfig(steps=20)

    r = pipe.txt2img(cond, unc, 2048, 512, sp, 0, tiled_diffusion=td, decode=False)
    np.asarray(r.latents)
    t0 = time.time()
    for i in range(1, 4):
        r = pipe.txt2img(cond, unc, 2048, 512, sp, i, tiled_diffusion=td, decode=False)
        np.asarray(r.latents)
    dtm = (time.time() - t0) / 3
    print(f"flags={flags} -> {dtm:.2f}s/image sampling")
    return dtm


def bench_deepcache():
    """DeepCache interval A/B on the EXACT config-2 bench workload (txt2img
    2048x512 incl. tiled-VAE decode), one pipeline, one param build: the jit
    cache keys on SamplerConfig.deepcache so each N compiles its own
    executable (VERDICT r3 item 2)."""
    from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, VAEConfig,
                                random_params, sd15_unet_config)
    from mdu_tpu.models.unet import default_unet_layout
    from mdu_tpu.pipeline import DiffusionPipeline

    dt = jnp.bfloat16
    unet = UNet2DCondition(sd15_unet_config(), dtype=dt,
                           layout=default_unet_layout())
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    up = jax.tree.map(lambda a: a.astype(dt),
                      random_params(unet, 0, jnp.zeros((1, 4, 8, 8)),
                                    jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), dt) * 0.1}
    unc = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768), dt) * 0.1}
    td = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=96, tile_h=96,
                              overlap=48, tile_bs=8)
    tv = TiledVAEConfig(decoder_tile_size=64, fast_decoder=False,
                        fast_encoder=False)
    ref_img = None
    for n in (1, 2, 3):
        sp = SamplerConfig(name="Euler", steps=20, cfg_scale=7.0, deepcache=n)

        def run(seed, sp=sp):
            return pipe.txt2img(cond, unc, width=2048, height=512, sampler=sp,
                                seed=seed, tiled_diffusion=td, tiled_vae=tv)

        t0 = time.time()
        r = run(0)
        print(f"deepcache={n} first (incl. compile): {time.time()-t0:.1f}s",
              flush=True)
        reps = 3
        t0 = time.time()
        for i in range(1, reps + 1):
            r = run(i)                 # txt2img returns a synced np image
        dtm = (time.time() - t0) / reps
        img0 = np.asarray(run(0).images, np.float32) / 255.0
        if n == 1:
            ref_img = img0
            drift = 0.0
        else:
            drift = float(np.abs(img0 - ref_img).mean())
        print(f"deepcache={n}: {dtm:.2f}s/image = {60/dtm:.2f} img/min "
              f"(mean |d| vs exact {drift:.4f}, images in [0,1])", flush=True)


def bench_decode_tile():
    """Decoder-tile-size A/B on the exact config-2 workload.

    Sampling already runs near the matmul roofline (~133 TF/s effective at
    20 steps), so the remaining fat in the 3.0 s/img exact number is the
    tiled-VAE decode: tile 64 on a 256x64 latent pays 5 tiles of halo +
    per-tile GroupNorm lockstep sync.  Exact lockstep stats are global, so
    the output is tile-size-independent (fp rounding aside) — a larger tile
    is the same math with less redundant halo compute."""
    from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
    from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, VAEConfig,
                                random_params, sd15_unet_config)
    from mdu_tpu.models.unet import default_unet_layout
    from mdu_tpu.pipeline import DiffusionPipeline

    dt = jnp.bfloat16
    unet = UNet2DCondition(sd15_unet_config(), dtype=dt,
                           layout=default_unet_layout())
    vae = AutoencoderKL(VAEConfig(), dtype=dt)
    up = jax.tree.map(lambda a: a.astype(dt),
                      random_params(unet, 0, jnp.zeros((1, 4, 8, 8)),
                                    jnp.zeros((1,)), jnp.zeros((1, 77, 768))))
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(2), (1, 77, 768), dt) * 0.1}
    unc = {"crossattn": jax.random.normal(jax.random.PRNGKey(3), (1, 77, 768), dt) * 0.1}
    td = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=96, tile_h=96,
                              overlap=48, tile_bs=8)
    sp = SamplerConfig(name="Euler", steps=20, cfg_scale=7.0)
    ref_img = None
    for ts in (64, 96, 128):
        tv = TiledVAEConfig(decoder_tile_size=ts, fast_decoder=False,
                            fast_encoder=False)

        def run(seed, tv=tv):
            return pipe.txt2img(cond, unc, width=2048, height=512, sampler=sp,
                                seed=seed, tiled_diffusion=td, tiled_vae=tv)

        t0 = time.time()
        r = run(0)
        print(f"decode_tile={ts} first (incl. compile): {time.time()-t0:.1f}s",
              flush=True)
        reps = 3
        t0 = time.time()
        for i in range(1, reps + 1):
            r = run(i)                 # txt2img returns a synced np image
        dtm = (time.time() - t0) / reps
        img0 = np.asarray(run(0).images, np.float32) / 255.0
        if ref_img is None:
            ref_img, drift = img0, 0.0
        else:
            drift = float(np.abs(img0 - ref_img).mean())
        print(f"decode_tile={ts}: {dtm:.2f}s/image = {60/dtm:.2f} img/min "
              f"(mean |d| vs tile64 {drift:.5f})", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", action="store_true")
    ap.add_argument("--flash-t", action="store_true")
    ap.add_argument("--fused-conv", action="store_true")
    ap.add_argument("--nhwc", action="store_true")
    ap.add_argument("--flash-fm", action="store_true")
    ap.add_argument("--conv-mm", action="store_true")
    ap.add_argument("--xattn", action="store_true")
    ap.add_argument("--deepcache", action="store_true")
    ap.add_argument("--decode-tile", action="store_true")
    args = ap.parse_args()
    if args.decode_tile:
        bench_decode_tile()
    elif args.deepcache:
        bench_deepcache()
    elif args.xattn:
        bench_xattn()
    elif args.flash_t:
        bench_flash_t()
    elif args.kernels:
        bench_kernels()
    elif args.fused_conv:
        base = bench_pipeline({"MDU_FUSED_CONV": "0"})
        fc = bench_pipeline({"MDU_FUSED_CONV": "1"})
        print(f"baseline {base:.2f}s | +fused_conv {fc:.2f}s")
    elif args.nhwc:
        base = bench_pipeline({"MDU_UNET_LAYOUT": "NCHW"})
        nhwc = bench_pipeline({"MDU_UNET_LAYOUT": "NHWC"})
        nhwc_fc = bench_pipeline({"MDU_UNET_LAYOUT": "NHWC",
                                  "MDU_FUSED_CONV": "1"})
        print(f"NCHW {base:.2f}s | NHWC {nhwc:.2f}s | NHWC+fused_conv {nhwc_fc:.2f}s")
    elif args.conv_mm:
        # conv floor attack: 3x3 convs as MXU matmuls, in-pipeline truth
        # (microbench: scripts/conv_matmul_bench.py)
        base = bench_pipeline({"MDU_CONV_MM": ""})
        mm9 = bench_pipeline({"MDU_CONV_MM": "9mm"})
        i2c = bench_pipeline({"MDU_CONV_MM": "im2col"})
        mm9h = bench_pipeline({"MDU_CONV_MM": "9mm", "MDU_UNET_LAYOUT": "NHWC"})
        i2ch = bench_pipeline({"MDU_CONV_MM": "im2col", "MDU_UNET_LAYOUT": "NHWC"})
        print(f"base {base:.2f}s | 9mm {mm9:.2f}s | im2col {i2c:.2f}s "
              f"| 9mm+NHWC {mm9h:.2f}s | im2col+NHWC {i2ch:.2f}s")
    elif args.flash_fm:
        base = bench_pipeline({"MDU_FLASH": "trans"})
        fm = bench_pipeline({"MDU_FLASH": "fm"})
        fm16 = bench_pipeline({"MDU_FLASH": "fm16"})
        print(f"flash=trans {base:.2f}s | fm {fm:.2f}s | fm16 {fm16:.2f}s")
    else:
        lane = bench_pipeline({"MDU_FLASH": "lane", "MDU_GN": ""})
        trans = bench_pipeline({"MDU_FLASH": "trans", "MDU_GN": ""})
        cr = bench_pipeline({"MDU_FLASH": "trans", "MDU_GN": "chanreduce"})
        print(f"flash=lane {lane:.2f}s | flash=trans {trans:.2f}s "
              f"| +GN chanreduce {cr:.2f}s")
