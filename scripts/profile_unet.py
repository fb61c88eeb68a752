"""UNet step time attribution on the real TPU (ROADMAP item 1 / VERDICT 3).

No xprof through the tunnel, so attribution is by ablation: time the full
CFG'd UNet tile-batch step, then variants with pieces disabled, and report
the deltas plus achieved TFLOP/s.

    python scripts/profile_unet.py [--tile-bs 8]
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


def chain_time(step_x, x, n=6):
    """Time n chained applications via lax.scan — per-call timing through
    the async remote tunnel under-reports wildly (dispatch returns before
    execution), so the chain forces sequential on-device execution."""
    def body(c, _):
        return step_x(c), None

    g = jax.jit(lambda x: jax.lax.scan(body, x, None, length=n)[0].sum())
    print("  compiling...", file=sys.stderr, flush=True)
    np.asarray(g(x))
    print("  compiled", file=sys.stderr, flush=True)
    t0 = time.time()
    np.asarray(g(x))
    return (time.time() - t0) / n


def unet_flops(cfg, B, h, w, L=77):
    """Rough FLOP count: conv + attention + ff matmuls."""
    total = 0
    bc = cfg.block_out_channels
    spatial = [(h // (2 ** i), w // (2 ** i)) for i in range(len(bc))]
    prev_c = cfg.in_channels
    for i, ch in enumerate(bc):
        hh, ww = spatial[i]
        npix = hh * ww
        for _ in range(cfg.layers_per_block):
            total += 2 * B * npix * 9 * (prev_c * ch + ch * ch)      # res convs
            prev_c = ch
            if cfg.transformer_layers[i] > 0:
                heads_d = ch
                for _ in range(cfg.transformer_layers[i]):
                    total += 2 * B * npix * heads_d * heads_d * 4    # qkv+out
                    total += 2 * B * npix * npix * heads_d * 2       # scores+pv
                    total += 2 * B * npix * heads_d * cfg.cross_attention_dim * 2  # cross kv
                    total += 2 * B * npix * L * heads_d * 2          # cross attn
                    total += 2 * B * npix * heads_d * heads_d * 8    # GEGLU ff
    return total * 2.5   # up path + mid, rough


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile-bs", type=int, default=8)
    args = ap.parse_args()

    from mdu_tpu.models import UNet2DCondition, random_params, sd15_unet_config
    from mdu_tpu.ops import attention

    dt = jnp.bfloat16
    cfg = sd15_unet_config()
    B = args.tile_bs * 2                 # CFG pairs
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 96, 96), dt)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 768), dt)

    unet = UNet2DCondition(cfg, dtype=dt)
    params = jax.tree.map(lambda a: a.astype(dt),
                          random_params(unet, 0, x[:1], t[:1], ctx[:1]))

    print('timing full UNet step...', file=sys.stderr, flush=True)
    dt_full = chain_time(lambda c: unet.apply(params, c, t, ctx), x)
    fl = unet_flops(cfg, B, 96, 96)
    print(f"full UNet step [{B},4,96,96]: {dt_full*1e3:.2f} ms "
          f"(~{fl/dt_full/1e12:.0f} TFLOP/s of ~{fl/1e12:.1f} TF)")

    # ---- isolated flash attention at the real SD1.5 level shapes
    from mdu_tpu.ops.pallas import flash_attention
    for (Hn, L, D) in ((8, 9216, 40), (8, 2304, 80), (8, 576, 160)):
        q = jax.random.normal(jax.random.PRNGKey(2), (B, Hn, L, D), dt)
        d = chain_time(lambda c: flash_attention(c, c, c), q, n=10)
        fl_a = 4 * B * Hn * L * L * D
        print(f"flash [B={B},{Hn},{L},{D}]: {d*1e3:.2f} ms "
              f"({fl_a/d/1e12:.1f} useful TFLOP/s; D pads to 128)")

    # ---- GroupNorm share: count x cost at each level
    from mdu_tpu.ops.groupnorm import group_norm
    for (C, hh, ww, count) in ((320, 96, 96, 14), (640, 48, 48, 14),
                               (1280, 24, 24, 20)):
        xa = jax.random.normal(jax.random.PRNGKey(3), (B, C, hh, ww), dt)
        w1 = jnp.ones((C,))
        d = chain_time(lambda c: group_norm(c, 32, w1, jnp.zeros((C,))).astype(dt), xa)
        print(f"group_norm [{B},{C},{hh},{ww}] x~{count}/step: {d*1e3:.3f} ms "
              f"(~{d*count*1e3:.2f} ms/step total)")


if __name__ == "__main__":
    main()
