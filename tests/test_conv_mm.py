"""conv3x3-as-matmuls (ops/conv_mm.py) == XLA conv_general_dilated.

MDU_CONV_MM rewrites every 'same' stride-1 3x3 conv into MXU matmuls
(9 shifted matmuls or one im2col matmul) — the candidate fix for the
conv throughput floor (docs/TUNING.md).  These tests pin that the
rewrite changes the schedule, never the math, at both the op and the
whole-UNet level and in both activation layouts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.ops.conv_mm import conv3x3_mm


def _xla_conv(x, w, layout):
    if layout == "NHWC":
        wk = w.transpose(2, 3, 1, 0)
        dn = ("NHWC", "HWIO", "NHWC")
    else:
        wk = w
        dn = ("NCHW", "OIHW", "NCHW")
    dnum = jax.lax.conv_dimension_numbers(x.shape, wk.shape, dn)
    return jax.lax.conv_general_dilated(x, wk, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=dnum)


@pytest.mark.parametrize("layout", ["NHWC", "NCHW"])
@pytest.mark.parametrize("mode", ["9mm", "im2col"])
def test_conv3x3_mm_matches_xla(rng, layout, mode):
    B, C, H, W, O = 2, 5, 9, 12, 7           # ragged shapes: padding math
    w = jnp.asarray(rng.normal(size=(O, C, 3, 3)).astype(np.float32)) * 0.2
    x4 = rng.normal(size=(B, C, H, W)).astype(np.float32)
    x = jnp.asarray(x4 if layout == "NCHW" else x4.transpose(0, 2, 3, 1))
    got = jax.jit(lambda a, b: conv3x3_mm(a, b, mode=mode, layout=layout))(x, w)
    want = _xla_conv(x, w, layout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["9mm", "im2col"])
def test_conv2d_layer_dispatch(rng, monkeypatch, mode):
    """Conv2D honours MDU_CONV_MM only for same/stride-1 3x3 kernels."""
    from mdu_tpu.models.layers import Conv2D

    x = jnp.asarray(rng.normal(size=(1, 6, 10, 11)).astype(np.float32))
    for kw in (dict(kernel_size=(3, 3)),                      # rewritten
               dict(kernel_size=(1, 1), padding=0),           # untouched
               dict(kernel_size=(3, 3), strides=(2, 2))):     # untouched
        layer = Conv2D(8, **kw)
        params = layer.init(jax.random.PRNGKey(0), x)
        plain = layer.apply(params, x)
        monkeypatch.setenv("MDU_CONV_MM", mode)
        mm = layer.apply(params, x)
        prims = {str(eqn.primitive) for eqn in
                 jax.make_jaxpr(lambda a: layer.apply(params, a))(x).jaxpr.eqns}
        monkeypatch.delenv("MDU_CONV_MM")
        rewritten = kw == dict(kernel_size=(3, 3))
        assert ("conv_general_dilated" not in prims) == rewritten, (kw, prims)
        np.testing.assert_allclose(np.asarray(mm), np.asarray(plain),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("layout", ["NCHW", "NHWC"])
def test_unet_conv_mm_matches_plain(rng, monkeypatch, layout):
    """Whole tiny UNet under MDU_CONV_MM == the plain conv program
    (covers the scale/shift fused-GroupNorm pre-chain in ResBlocks)."""
    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg, layout=layout)
    x = jnp.asarray(rng.normal(size=(1, 4, 16, 16)).astype(np.float32))
    t = jnp.asarray([5.0])
    ctx = jnp.asarray(rng.normal(size=(1, 7, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, x, t, ctx)
    plain = jax.jit(unet.apply)(params, x, t, ctx)
    monkeypatch.setenv("MDU_CONV_MM", "9mm")
    mm = jax.jit(unet.apply)(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(plain),
                               rtol=5e-5, atol=5e-5)
