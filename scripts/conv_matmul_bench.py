"""Microbench: XLA conv_general_dilated vs conv3x3-as-9-shifted-matmuls.

TUNING.md: XLA conv runs 47-60 TF/s at SD shapes vs 144-154 TF/s matmul
roofline.  If expressing the 3x3 conv as 9 [HW, Cin] @ [Cin, Cout] matmuls
(shifted views, accumulated) lets XLA hit matmul throughput, that's the
remaining ~1s of the 2.7s sampling step.
"""
import time, functools
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/mdu_jax_cache")


def timeit(fn, *args, n=20, reps=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        o = None
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def conv_xla(x, w):
    # x [B,C,H,W], w [O,I,3,3]
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def conv_xla_nhwc(x, w):
    # x [B,H,W,C], w [3,3,I,O]
    return jax.lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_9mm(x, w):
    """x [B,H,W,C] NHWC, w [3,3,I,O].  9 shifted matmuls accumulated."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, O), dtype=x.dtype)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jnp.einsum("bhwc,co->bhwo", xs, w[dy, dx],
                                   preferred_element_type=jnp.float32).astype(x.dtype)
    return acc


def conv_9mm_flat(x, w):
    """Same but single [B*H*W, C] @ [C, O] per tap on a flattened view."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * H * W, O), dtype=jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            acc = acc + jnp.dot(xs.reshape(B * H * W, C), w[dy, dx],
                                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype).reshape(B, H, W, O)


def conv_im2col(x, w):
    """im2col: concat 9 shifted views on C, one [BHW, 9C] @ [9C, O] matmul."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, W, C))
            for dy in range(3) for dx in range(3)]
    xc = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * C)
    wf = w.reshape(9 * C, O)
    y = jnp.dot(xc, wf, preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(B, H, W, O)


SHAPES = [  # (B, C, H, W, O) — SD1.5 UNet hot resblock shapes (tile_bs 8 x cfg 2 -> b16; b10 legacy)
    (16, 320, 64, 96, 320),
    (16, 640, 32, 48, 640),
    (16, 1280, 16, 24, 1280),
    (16, 1280, 8, 12, 1280),
    (16, 640, 64, 96, 320),   # decoder-side concat channels
]

dt = jnp.bfloat16
for (B, C, H, W, O) in SHAPES:
    kn = np.random.default_rng(0).normal(size=(O, C, 3, 3)).astype(np.float32) * 0.02
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, C, H, W)), dt)
    w = jnp.asarray(kn, dt)
    xh = jnp.transpose(x, (0, 2, 3, 1))
    wh = jnp.transpose(w, (2, 3, 1, 0))
    flops = 2 * B * H * W * C * O * 9

    import sys
    sys.path.insert(0, "/root/repo")
    from mdu_tpu.ops.conv_mm import conv3x3_mm   # the shipped path (MDU_CONV_MM)

    fns = [("xla-nchw", jax.jit(conv_xla), (x, w)),
           ("xla-nhwc", jax.jit(conv_xla_nhwc), (xh, wh)),
           ("9mm     ", jax.jit(conv_9mm), (xh, wh)),
           ("9mm-flat", jax.jit(conv_9mm_flat), (xh, wh)),
           ("im2col  ", jax.jit(conv_im2col), (xh, wh)),
           ("mm9-nchw", jax.jit(lambda a, b: conv3x3_mm(a, b, "9mm", "NCHW")), (x, w)),
           ("i2c-nchw", jax.jit(lambda a, b: conv3x3_mm(a, b, "im2col", "NCHW")), (x, w))]
    ref = None
    for name, fn, args in fns:
        ms = timeit(fn, *args)
        out = np.asarray(fn(*args), np.float32)
        if out.shape[1] == C or out.ndim == 4 and out.shape[-1] != O:
            pass
        if name.strip() == "xla-nchw":
            ref = np.transpose(out, (0, 2, 3, 1))
            err = 0.0
        else:
            if out.shape != ref.shape:          # NCHW-output variants
                out = np.transpose(out, (0, 2, 3, 1))
            err = float(np.max(np.abs(out - ref))) if ref is not None else -1
        print(f"[{B},{C},{H},{W}]->{O} {name}: {ms:7.3f} ms  "
              f"{flops/ms/1e9:6.1f} TF/s  maxerr {err:.2e}", flush=True)
    print()
