"""Channels-last (NHWC) UNet layout equivalence.

``UNet2DCondition(layout='NHWC')`` runs the whole network channels-last
internally (TPU-native: convs, GroupNorm, and the token reshape need no
per-layer activation transposes) while keeping the public NCHW contract
and the exact same parameter tree.  These tests pin the invariant that
the layout flag changes the schedule, never the math.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import (
    ControlNet,
    UNet2DCondition,
    random_params,
    tiny_sdxl_unet_config,
    tiny_unet_config,
)


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(7), 4)


def _pair(cfg):
    return (UNet2DCondition(cfg, layout="NCHW"),
            UNet2DCondition(cfg, layout="NHWC"))


def test_nhwc_param_tree_identical(keys):
    """Checkpoints must load unchanged: same names, same shapes."""
    cfg = tiny_unet_config()
    ref, alt = _pair(cfg)
    x = jnp.zeros((1, 4, 16, 16))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    s_ref = jax.eval_shape(lambda: ref.init(jax.random.PRNGKey(0), x, t, ctx))
    s_alt = jax.eval_shape(lambda: alt.init(jax.random.PRNGKey(0), x, t, ctx))
    # compare the checkpoint-bearing collection only: NCHW init also sows a
    # gn_stats cache (a Tiled-VAE feature), which is not part of a checkpoint
    flat_ref = jax.tree_util.tree_map(lambda a: a.shape, s_ref["params"])
    flat_alt = jax.tree_util.tree_map(lambda a: a.shape, s_alt["params"])
    assert flat_ref == flat_alt


def test_nhwc_matches_nchw_sd15(keys):
    cfg = tiny_unet_config()
    ref, alt = _pair(cfg)
    x = jax.random.normal(keys[0], (2, 4, 16, 24), jnp.float32)
    t = jnp.array([10.0, 500.0])
    ctx = jax.random.normal(keys[1], (2, 7, cfg.cross_attention_dim), jnp.float32)
    params = random_params(ref, 0, x, t, ctx)
    y_ref = jax.jit(ref.apply)(params, x, t, ctx)
    y_alt = jax.jit(alt.apply)(params, x, t, ctx)
    assert y_alt.shape == x.shape
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_alt),
                               atol=2e-5, rtol=2e-5)


def test_nhwc_matches_nchw_sdxl(keys):
    cfg = tiny_sdxl_unet_config()
    ref, alt = _pair(cfg)
    x = jax.random.normal(keys[0], (1, 4, 16, 16), jnp.float32)
    t = jnp.array([10.0])
    ctx = jax.random.normal(keys[1], (1, 7, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jax.random.normal(keys[3], (1, cfg.addition_pooled_dim)),
        "time_ids": jnp.ones((1, 6)),
    }
    params = random_params(ref, 0, x, t, ctx, added)
    y_ref = jax.jit(ref.apply)(params, x, t, ctx, added)
    y_alt = jax.jit(alt.apply)(params, x, t, ctx, added)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_alt),
                               atol=2e-5, rtol=2e-5)


def test_nhwc_controlnet_residuals(keys):
    """ControlNet residuals arrive NCHW (the adapter keeps the reference
    layout); the NHWC UNet rotates them at the add sites.  Use non-zero
    random residuals so a wrong orientation cannot cancel out."""
    cfg = tiny_unet_config()
    ref, alt = _pair(cfg)
    cn = ControlNet(cfg)
    x = jax.random.normal(keys[0], (1, 4, 16, 16), jnp.float32)
    t = jnp.array([5.0])
    ctx = jax.random.normal(keys[1], (1, 7, cfg.cross_attention_dim), jnp.float32)
    hint = jax.random.normal(keys[2], (1, 3, 128, 128), jnp.float32)
    cp = random_params(cn, 1, x, t, ctx, hint)
    shapes = jax.eval_shape(cn.apply, cp, x, t, ctx, hint)
    rng = np.random.default_rng(3)
    down = [jnp.asarray(rng.standard_normal(s.shape, np.float32) * 0.1)
            for s in shapes[0]]
    mid = jnp.asarray(rng.standard_normal(shapes[1].shape, np.float32) * 0.1)
    params = random_params(ref, 0, x, t, ctx)
    run_ref = jax.jit(lambda p, x, t, c, r: ref.apply(p, x, t, c, residuals=r))
    run_alt = jax.jit(lambda p, x, t, c, r: alt.apply(p, x, t, c, residuals=r))
    y_ref = run_ref(params, x, t, ctx, (down, mid))
    y_alt = run_alt(params, x, t, ctx, (down, mid))
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_alt),
                               atol=2e-5, rtol=2e-5)
