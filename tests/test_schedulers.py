"""MultiDiffusion / Mixture-of-Diffusers combinator semantics
(ref multidiffusion.py:131-218, mixtureofdiffusers.py:61-179)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import Method
from mdu_tpu.tiling.schedulers import make_tiled_denoiser, plan_tiled_diffusion
from mdu_tpu.utils.bbox import BlendMode, RegionSpec


def identity_tile(x, sigma, step, bboxes, batch_i):
    return x


def pointwise_tile(x, sigma, step, bboxes, batch_i):
    return 2.0 * x + 1.0


@pytest.mark.parametrize("method", [Method.MULTI_DIFF, Method.MIX_DIFF])
def test_identity_denoiser_is_identity(method, rng):
    """Fusing identity per-tile outputs must reproduce the canvas exactly:
    MD divides by paint counts; MoD's gaussian*rescale sums to 1."""
    plan = plan_tiled_diffusion(method, 64, 96, tile_h=48, tile_w=48,
                                overlap=16, tile_bs=3)
    fn = make_tiled_denoiser(plan, identity_tile)
    x = jnp.asarray(rng.normal(size=(2, 4, 64, 96)).astype(np.float32))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=2e-5)


@pytest.mark.parametrize("method", [Method.MULTI_DIFF, Method.MIX_DIFF])
def test_pointwise_denoiser_fuses_pointwise(method, rng):
    plan = plan_tiled_diffusion(method, 64, 64, tile_h=32, tile_w=32,
                                overlap=8, tile_bs=2)
    fn = make_tiled_denoiser(plan, pointwise_tile)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 64)).astype(np.float32))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x) + 1, atol=3e-5)


def test_background_region_adds_weight(rng):
    """A BACKGROUND region overlapping the grid contributes and is averaged
    (ref multidiffusion.py:44-46, 189-190)."""
    regions = [RegionSpec(0.25, 0.25, 0.5, 0.5, "cat", blend_mode=BlendMode.BACKGROUND)]
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 64, 64, tile_h=64, tile_w=64,
                                overlap=8, tile_bs=1, regions=regions)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 64)).astype(np.float32))

    def region_denoise(xt, sigma, step, idx):
        return jnp.full_like(xt, 10.0)

    fn = make_tiled_denoiser(plan, identity_tile, region_denoise)
    out = np.asarray(jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0)))
    # inside region: (x + 10)/2 ; outside: x
    inside = out[:, :, 16:48, 16:48]
    np.testing.assert_allclose(inside, (np.asarray(x)[:, :, 16:48, 16:48] + 10) / 2, atol=1e-5)
    np.testing.assert_allclose(out[:, :, :16, :], np.asarray(x)[:, :, :16, :], atol=1e-5)


def test_foreground_region_feathers(rng):
    regions = [RegionSpec(0.25, 0.25, 0.5, 0.5, "cat",
                          blend_mode=BlendMode.FOREGROUND, feather_ratio=0.5)]
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 64, 64, tile_h=64, tile_w=64,
                                overlap=8, tile_bs=1, regions=regions)
    x = jnp.zeros((1, 4, 64, 64), jnp.float32)

    def region_denoise(xt, sigma, step, idx):
        return jnp.full_like(xt, 8.0)

    fn = make_tiled_denoiser(plan, identity_tile, region_denoise)
    out = np.asarray(jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0)))
    center = out[0, 0, 32, 32]
    corner_in = out[0, 0, 16, 16]        # feathered edge of the region
    assert center == pytest.approx(8.0, abs=1e-5)   # full feather weight inside
    assert corner_in == pytest.approx(0.0, abs=1e-5)  # zero weight at corner
    assert out[0, 0, 0, 0] == 0.0                     # untouched outside


def test_mod_weights_strictly_positive():
    plan = plan_tiled_diffusion(Method.MIX_DIFF, 96, 160, tile_h=64, tile_w=64,
                                overlap=32, tile_bs=4)
    assert (plan.weights > 0).all()


def test_passthrough_for_mismatched_shape(rng):
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 64, 64, tile_h=32, tile_w=32,
                                overlap=8, tile_bs=2)
    called = {}

    def org(x, sigma, step):
        called["yes"] = True
        return x * 0.5

    fn = make_tiled_denoiser(plan, identity_tile, org_fn=org)
    x = jnp.ones((1, 4, 128, 128))
    out = fn(x, jnp.asarray(1.0), jnp.asarray(0))
    assert called.get("yes")
    np.testing.assert_allclose(np.asarray(out), 0.5)


def test_progress_units():
    regions = [RegionSpec(0.1, 0.1, 0.3, 0.3, "a")]
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 96, 96, tile_h=48, tile_w=48,
                                overlap=16, tile_bs=2, regions=regions)
    assert plan.total_units == plan.num_batches + 1


def test_mod_with_background_region_identity(rng):
    """MoD partition of unity still holds when a BACKGROUND region's gaussian
    weights fold into the canvas (ref mixtureofdiffusers.py:45-55)."""
    regions = [RegionSpec(0.25, 0.25, 0.5, 0.5, "mid", blend_mode=BlendMode.BACKGROUND)]
    plan = plan_tiled_diffusion(Method.MIX_DIFF, 64, 64, tile_h=32, tile_w=32,
                                overlap=16, tile_bs=2, regions=regions)

    def region_identity(xt, sigma, step, idx):
        return xt

    fn = make_tiled_denoiser(plan, identity_tile, region_identity)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 64)).astype(np.float32))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=3e-5)


def test_mod_regions_only_no_background(rng):
    """draw_background=False: only region areas are painted, rest stays 0
    (ref mixtureofdiffusers.py:177-179 'leave it as it is')."""
    regions = [RegionSpec(0.0, 0.0, 0.5, 1.0, "left", blend_mode=BlendMode.BACKGROUND)]
    plan = plan_tiled_diffusion(Method.MIX_DIFF, 32, 32, tile_h=32, tile_w=32,
                                overlap=8, tile_bs=1, regions=regions,
                                draw_background=False)
    assert not plan.draw_background and len(plan.bboxes) == 0

    fn = make_tiled_denoiser(plan, identity_tile,
                             lambda xt, s, i, idx: jnp.ones_like(xt) * 5.0)
    x = jnp.zeros((1, 4, 32, 32))
    out = np.asarray(jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0)))
    np.testing.assert_allclose(out[:, :, :, :16], 5.0, atol=1e-5)
    np.testing.assert_allclose(out[:, :, :, 16:], 0.0, atol=1e-6)
