"""Model zoo shape/sanity tests on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import (
    AutoencoderKL,
    random_params,
    CLIPTextModel,
    UNet2DCondition,
    tiny_clip_config,
    tiny_sdxl_unet_config,
    tiny_unet_config,
    tiny_vae_config,
)


@pytest.fixture(scope="module")
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 4)


def test_vae_roundtrip_shapes(keys):
    cfg = tiny_vae_config()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(keys[0], (1, 3, 64, 64), jnp.float32)
    params = random_params(vae, 0, x, keys[2])
    moments = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_moments))(params, x)
    assert moments.shape == (1, 8, 8, 8)          # /8 downscale, 2*4 moments
    from mdu_tpu.models import sample_from_moments
    z = sample_from_moments(moments, keys[2])
    assert z.shape == (1, 4, 8, 8)
    out = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_shapes(keys):
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(keys[0], (2, 4, 16, 16), jnp.float32)
    t = jnp.array([10.0, 500.0])
    ctx = jax.random.normal(keys[1], (2, 7, cfg.cross_attention_dim), jnp.float32)
    params = random_params(unet, 0, x, t, ctx)
    out = jax.jit(unet.apply)(params, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("hw", [(16, 24), (12, 20), (11, 13)])
def test_unet_odd_spatial(keys, hw):
    """Latents not divisible by 2^levels must still round-trip the U: the
    up path nearest-resizes to each skip's spatial size, as diffusers'
    forwarded ``upsample_size`` does on the reference's torch stack."""
    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(keys[0], (1, 4) + hw, jnp.float32)
    t = jnp.array([3.0])
    ctx = jax.random.normal(keys[1], (1, 7, cfg.cross_attention_dim), jnp.float32)
    params = random_params(unet, 0, x, t, ctx)
    out = jax.jit(unet.apply)(params, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_sdxl_unet_added_cond(keys):
    cfg = tiny_sdxl_unet_config()
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(keys[0], (1, 4, 16, 16), jnp.float32)
    t = jnp.array([10.0])
    ctx = jax.random.normal(keys[1], (1, 7, cfg.cross_attention_dim), jnp.float32)
    added = {
        "text_embeds": jax.random.normal(keys[3], (1, cfg.addition_pooled_dim)),
        "time_ids": jnp.ones((1, 6)),
    }
    params = random_params(unet, 0, x, t, ctx, added)
    out = jax.jit(unet.apply)(params, x, t, ctx, added)
    assert out.shape == x.shape


def test_clip_text_model(keys):
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    ids = jnp.array([[5, 7, 999, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    params = random_params(model, 0, ids)
    hidden, pooled = jax.jit(model.apply)(params, ids)
    assert hidden.shape == (1, 16, cfg.hidden_size)
    assert pooled.shape == (1, cfg.hidden_size)
    # pooled state taken at the EOT (max-id) position
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[:, 2]), atol=1e-5)


def test_clip_skip_changes_output(keys):
    import dataclasses
    cfg1 = tiny_clip_config()
    cfg2 = dataclasses.replace(cfg1, clip_skip=2)
    ids = jnp.array([[5, 7, 999] + [0] * 13])
    m1, m2 = CLIPTextModel(cfg1), CLIPTextModel(cfg2)
    params = random_params(m1, 0, ids)
    h1, _ = jax.jit(m1.apply)(params, ids)
    h2, _ = jax.jit(m2.apply)(params, ids)
    assert np.abs(np.asarray(h1) - np.asarray(h2)).max() > 1e-6
