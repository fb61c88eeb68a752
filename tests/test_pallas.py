"""Pallas kernel correctness (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.ops.attention import sdpa
from mdu_tpu.ops.pallas import flash_attention


@pytest.mark.parametrize("Lq,Lk,D", [
    (128, 128, 64),
    (200, 200, 40),     # unaligned L and D (SD1.5 head dim)
    (256, 77, 64),      # cross-attention shape
    (513, 513, 128),
])
def test_flash_matches_sdpa(rng, Lq, Lk, D):
    B, H = 1, 2
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_scale_override(rng):
    q = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 128, 32)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v, scale=0.05))
    got = np.asarray(flash_attention(q, k, v, scale=0.05, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_bf16(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 64)), jnp.bfloat16)
    want = np.asarray(sdpa(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention(q, k, v, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("Lq,Lk,D", [
    (128, 128, 64),
    (200, 200, 40),     # unaligned L and D (SD1.5 head dim)
    (256, 77, 64),      # cross-attention shape
    (513, 513, 160),    # SD1.5 mid-level head dim
])
def test_flash_t_matches_sdpa(rng, Lq, Lk, D):
    from mdu_tpu.ops.pallas import flash_attention_t

    B, H = 1, 2
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention_t(q, k, v, block_q=128, block_k=128,
                                       interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_t_bf16(rng):
    from mdu_tpu.ops.pallas import flash_attention_t

    q = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    want = np.asarray(sdpa(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention_t(q, k, v, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("Lq,Lk,D", [
    (128, 128, 64),
    (200, 200, 40),     # unaligned L and D: exercises the ones-row masking
    (256, 77, 64),      # cross-attention shape (large kv pad)
    (513, 513, 160),
])
def test_flash_t_fm_matches_sdpa(rng, Lq, Lk, D):
    from mdu_tpu.ops.pallas import flash_attention_t_fm

    B, H = 1, 2
    q = jnp.asarray(rng.normal(size=(B, H, Lq, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, Lk, D)).astype(np.float32))
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention_t_fm(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flash_t_fm_extreme_logits(rng):
    """Large-magnitude logits (±10 range) with heavy kv padding: rows whose
    true max is within smax stay exact — the ones-row denominator counts
    only real kv columns, so padding must not pollute low-probability
    rows."""
    from mdu_tpu.ops.pallas import flash_attention_t_fm

    q = jnp.asarray(rng.normal(size=(1, 1, 130, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, 130, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 1, 130, 32)).astype(np.float32))
    q = q.at[:, :, :64].multiply(4.0)          # logits to ~±23 < smax=30
    want = np.asarray(sdpa(q, k, v))
    got = np.asarray(flash_attention_t_fm(q, k, v, block_q=128, block_k=128,
                                          interpret=True))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
    # logits beyond the default clamp need a raised smax to stay exact
    q8 = q.at[:, :, :64].multiply(2.0)         # ~±46 > 30
    want8 = np.asarray(sdpa(q8, k, v))
    got8 = np.asarray(flash_attention_t_fm(q8, k, v, block_q=128, block_k=128,
                                           smax=60.0, interpret=True))
    np.testing.assert_allclose(got8, want8, rtol=5e-4, atol=5e-4)


def test_flash_t_fm_bf16_exp(rng):
    from mdu_tpu.ops.pallas import flash_attention_t_fm

    q = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 2, 256, 40)), jnp.bfloat16)
    want = np.asarray(sdpa(q, k, v)).astype(np.float32)
    got = np.asarray(flash_attention_t_fm(q, k, v, bf16_exp=True,
                                          interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("B,H,W,C,Co", [
    (2, 8, 12, 16, 24),
    (1, 7, 9, 8, 8),        # odd spatial dims (block padding path)
])
def test_conv3x3_matches_xla(rng, B, H, W, C, Co):
    from mdu_tpu.ops.pallas.conv3x3 import fused_conv3x3

    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, Co)).astype(np.float32)) * 0.1
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)
    got = fused_conv3x3(x, w, interpret=True, block_h=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_conv3x3_fused_norm_silu(rng):
    """conv(silu(x*a + b)) with the zero halo staying zero (the 'same'
    padding is applied AFTER the activation, like the XLA chain)."""
    from mdu_tpu.ops.pallas.conv3x3 import fused_conv3x3

    B, H, W, C, Co = 2, 8, 12, 16, 24
    x = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, C, Co)).astype(np.float32)) * 0.1
    a = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32)) * 0.5 + 1.0
    b = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32)) * 0.2
    xf = x * a[:, None, None, :] + b[:, None, None, :]
    xs = xf * jax.nn.sigmoid(xf)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(xs, w, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dn)
    got = fused_conv3x3(x, w, a, b, fuse_act=True, interpret=True, block_h=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_resblock_fused_conv_path_matches_plain(rng, monkeypatch):
    """UNet ResBlock with MDU_FUSED_CONV=interp == the plain XLA chain."""
    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16)).astype(np.float32))
    t = jnp.asarray([5.0])
    ctx = jnp.asarray(rng.normal(size=(1, 7, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, x, t, ctx)
    plain = unet.apply(params, x, t, ctx)
    monkeypatch.setenv("MDU_FUSED_CONV", "interp")
    fused = unet.apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=5e-4, atol=5e-4)


def test_fused_tile_blend_matches_xla(rng):
    """Gather-formulated fused blend == scatter-add + divide reference."""
    from mdu_tpu.ops.fusion import scatter_add_tiles, weighted_average
    from mdu_tpu.ops.pallas import fused_tile_blend
    from mdu_tpu.utils import paint_count, split_grid

    h, w, tw = 64, 96, 32
    bboxes = tuple(split_grid(w, h, tw, tw, 16))
    T = len(bboxes)
    tiles = jnp.asarray(rng.normal(size=(T, 4, tw, tw)).astype(np.float32))
    weights = jnp.asarray(paint_count(w, h, bboxes)[0, 0])

    # XLA reference path
    canvas = scatter_add_tiles(jnp.zeros((1, 4, h, w)), tiles[:, None], bboxes)
    want = np.asarray(weighted_average(canvas, weights[None, None]))[0]

    got = np.asarray(fused_tile_blend(tiles, weights, h, w, bboxes,
                                      interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_contributor_table():
    from mdu_tpu.ops.pallas import build_contributor_table
    from mdu_tpu.utils import split_grid

    bboxes = split_grid(96, 64, 32, 32, 16)
    idx, offs, k = build_contributor_table(64, 96, bboxes, 32, 32)
    assert idx.shape[0] == 2 * 3                   # 64/32 x 96/32 blocks
    assert (idx >= -1).all() and k >= 1


def test_fused_group_norm_matches_reference(rng):
    from mdu_tpu.ops.groupnorm import group_norm
    from mdu_tpu.ops.pallas import fused_group_norm

    x = jnp.asarray(rng.normal(size=(2, 16, 8, 12)).astype(np.float32) * 3 + 1)
    w = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    want = np.asarray(group_norm(x, 4, w, b))
    got = np.asarray(fused_group_norm(x, 4, w, b, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_group_norm_bf16(rng):
    from mdu_tpu.ops.groupnorm import group_norm
    from mdu_tpu.ops.pallas import fused_group_norm

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 16)), jnp.bfloat16)
    w = jnp.ones((8,))
    b = jnp.zeros((8,))
    want = np.asarray(group_norm(x, 4, w, b)).astype(np.float32)
    got = np.asarray(fused_group_norm(x, 4, w, b, interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_fused_blend_integrated_parity(rng, monkeypatch):
    """make_tiled_denoiser with the fused kernel (interpret mode) must equal
    the plain scatter path for MD, MoD, and regions (VERDICT item 4)."""
    import jax
    import jax.numpy as jnp

    from mdu_tpu.config import Method
    from mdu_tpu.tiling.schedulers import make_tiled_denoiser, plan_tiled_diffusion
    from mdu_tpu.utils.bbox import BlendMode, RegionSpec

    def tile_denoise(flat, sigma, step, bboxes, batch_i):
        return flat * 0.5 + sigma * 0.1

    def region_denoise(xt, sigma, step, i):
        return xt * (0.3 + 0.2 * i)

    x = jnp.asarray(rng.normal(size=(1, 4, 32, 48)).astype(np.float32))
    regions = (RegionSpec(0.0, 0.0, 0.5, 1.0, blend_mode=BlendMode.BACKGROUND),
               RegionSpec(0.5, 0.0, 0.25, 0.5, blend_mode=BlendMode.FOREGROUND,
                          feather_ratio=0.3))
    for method in (Method.MULTI_DIFF, Method.MIX_DIFF):
        for regs in ((), regions):
            plan = plan_tiled_diffusion(method, 32, 48, tile_h=16, tile_w=16,
                                        overlap=8, tile_bs=2, regions=regs)
            monkeypatch.setenv("MDU_FUSED_BLEND", "0")
            ref = make_tiled_denoiser(plan, tile_denoise,
                                      region_denoise if regs else None)(
                x, jnp.asarray(1.0), jnp.asarray(0))
            monkeypatch.setenv("MDU_FUSED_BLEND", "interp")
            got = make_tiled_denoiser(plan, tile_denoise,
                                      region_denoise if regs else None)(
                x, jnp.asarray(1.0), jnp.asarray(0))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"{method} regions={bool(regs)}")
