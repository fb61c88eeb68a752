"""End-to-end pipeline integration on tiny models (SURVEY.md §4 bar:
CPU-runnable tiled generation; tiled == untiled in the degenerate case)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig, TiledVAEConfig
from mdu_tpu.models import (
    AutoencoderKL,
    UNet2DCondition,
    random_params,
    tiny_unet_config,
    tiny_vae_config,
)
from mdu_tpu.pipeline import DiffusionPipeline
from mdu_tpu.utils.bbox import BlendMode, RegionSpec


@pytest.fixture(scope="module")
def pipe():
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    return DiffusionPipeline(unet, up, vae, vp)


def _cond(key, dim=16, L=7):
    return {"crossattn": jax.random.normal(jax.random.PRNGKey(key), (1, L, dim)) * 0.1}


SAMPLER = SamplerConfig(steps=3)
TD = TiledDiffusionConfig(method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                          overlap=8, tile_bs=2)
TV = TiledVAEConfig(encoder_tile_size=96, decoder_tile_size=16, fast_decoder=False,
                    fast_encoder=False)


def test_txt2img_tiled_panorama(pipe):
    """256x128 px panorama => 32x16 latent, 16px tiles."""
    res = pipe.txt2img(_cond(0), _cond(1), width=256, height=128,
                       sampler=SAMPLER, seed=42, tiled_diffusion=TD,
                       tiled_vae=TV)
    assert res.images.shape == (1, 128, 256, 3)
    assert np.isfinite(np.asarray(res.latents)).all()
    assert res.info["Tiled Diffusion"]["Method"] == Method.MULTI_DIFF


@pytest.mark.parametrize("name", ["Restart", "DPM fast", "DPM adaptive",
                                  "DPM++ 2M SDE"])
def test_txt2img_special_samplers(pipe, name):
    """Samplers that split their schedule host-side (STATIC_SIGMA_SAMPLERS)
    and the 2M SDE multistep must run through the jitted pipeline (Restart
    regression: concrete-sigma ops were staged to tracers)."""
    res = pipe.txt2img(_cond(0), _cond(1), width=128, height=128,
                       sampler=dataclasses.replace(SAMPLER, name=name),
                       seed=7, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_txt2img_deterministic(pipe):
    a = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=42,
                     tiled_diffusion=TD, decode=False)
    b = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=42,
                     tiled_diffusion=TD, decode=False)
    np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))
    c = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=43,
                     tiled_diffusion=TD, decode=False)
    assert np.abs(np.asarray(a.latents) - np.asarray(c.latents)).max() > 1e-3


def test_untiled_equals_disabled_tiling(pipe):
    """When the canvas fits one tile, tiling is skipped entirely
    (ref tilediffusion.py:309-317)."""
    td_single = dataclasses.replace(TD, tile_w=32, tile_h=32)
    a = pipe.txt2img(_cond(0), _cond(1), 128, 128, SAMPLER, seed=5,
                     tiled_diffusion=td_single, decode=False)
    b = pipe.txt2img(_cond(0), _cond(1), 128, 128, SAMPLER, seed=5,
                     tiled_diffusion=None, decode=False)
    np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))


def test_mixture_of_diffusers_method(pipe):
    td = dataclasses.replace(TD, method=Method.MIX_DIFF)
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=1,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()


def test_img2img_upscale(pipe, rng):
    img = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    td = dataclasses.replace(TD, upscaler="Lanczos", scale_factor=2.0, overlap=8)
    res = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=9,
                       tiled_diffusion=td, tiled_vae=TV)
    assert res.images.shape == (1, 128, 128, 3)


def test_img2img_target_size(pipe, rng):
    """keep-input-size=off parity: the upscaled init is resized to the explicit
    canvas (ref tilediffusion.py:299-307) and the override is recorded."""
    img = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    td = dataclasses.replace(TD, upscaler="Lanczos", scale_factor=2.0, overlap=8)
    res = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=9,
                       tiled_diffusion=td, tiled_vae=TV,
                       target_size=(96, 160))
    assert res.images.shape == (1, 96, 160, 3)
    assert res.info["Target size"] == [96, 160]


def test_img2img_noise_inversion_and_cache(pipe, rng):
    img = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    td = dataclasses.replace(
        TD, upscaler="Lanczos", scale_factor=2.0,
        noise_inverse=True, noise_inverse_steps=2,
        noise_inverse_renoise_strength=0.5, noise_inverse_renoise_kernel=8)
    res = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=9,
                       tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    assert pipe.noise_inverse_cache is not None
    # second run hits the cache (same inputs)
    res2 = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=9,
                        tiled_diffusion=td, decode=False)
    np.testing.assert_array_equal(np.asarray(res.latents), np.asarray(res2.latents))
    pipe.free_cache()
    assert pipe.noise_inverse_cache is None


def test_img2img_noise_inversion_bf16(rng):
    """bf16 weights + bf16 encoder output through noise inversion (the TPU
    configuration): the inversion scan must keep a dtype-stable carry
    (regression: bf16 init_latent vs f32-promoted output carry)."""
    dt = jnp.bfloat16
    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg, dtype=dt)
    vae = AutoencoderKL(tiny_vae_config(), dtype=dt)
    up = jax.tree.map(lambda a: a.astype(dt),
                      random_params(unet, 0, jnp.zeros((1, 4, 16, 16)),
                                    jnp.zeros((1,)), jnp.zeros((1, 7, 16))))
    vp = jax.tree.map(lambda a: a.astype(dt),
                      random_params(vae, 1, jnp.zeros((1, 3, 64, 64)),
                                    jax.random.PRNGKey(0)))
    bpipe = DiffusionPipeline(unet, up, vae, vp)
    img = (rng.uniform(0, 255, size=(64, 64, 3))).astype(np.uint8)
    td = dataclasses.replace(
        TD, upscaler="Lanczos", scale_factor=2.0,
        noise_inverse=True, noise_inverse_steps=2,
        noise_inverse_renoise_strength=0.5, noise_inverse_renoise_kernel=8)
    cond = {"crossattn": jnp.zeros((1, 7, 16), dt)}
    res = bpipe.img2img(img, cond, cond, sampler=SAMPLER, seed=9,
                        tiled_diffusion=td, decode=False)
    assert np.isfinite(np.asarray(res.latents, np.float32)).all()


def test_regional_prompts(pipe):
    regions = [
        RegionSpec(0.0, 0.0, 0.5, 1.0, "left cat", seed=111),
        RegionSpec(0.5, 0.0, 0.5, 1.0, "right dog",
                   blend_mode=BlendMode.FOREGROUND, feather_ratio=0.3, seed=222),
    ]
    td = dataclasses.replace(TD, regions=regions)
    rc = [(_cond(10), _cond(11)), (_cond(12), _cond(13))]
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=7,
                       tiled_diffusion=td, region_conds=rc, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    assert "Region control" in res.info["Tiled Diffusion"]


def test_region_seed_changes_noise_locally(pipe):
    regions = [RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=111)]
    td = dataclasses.replace(TD, regions=regions)
    rc = [(_cond(10), _cond(11))]
    a = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=7,
                     tiled_diffusion=td, region_conds=rc, decode=False)
    regions2 = [RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=999)]
    td2 = dataclasses.replace(TD, regions=regions2)
    b = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=7,
                     tiled_diffusion=td2, region_conds=rc, decode=False)
    assert np.abs(np.asarray(a.latents) - np.asarray(b.latents)).max() > 1e-4


def test_hbm_guard_streams_exact_decode(pipe, monkeypatch):
    """With a tiny MDU_HBM_BYTES budget the exact lockstep decode must
    auto-switch to the streaming exact mode and produce the same image."""
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 32, 48))
                    .astype(np.float32)) * 0.2
    want = np.asarray(pipe._decode_tensor(z, TV))
    monkeypatch.setenv("MDU_HBM_BYTES", "1")
    pipe2 = DiffusionPipeline(pipe.unet, pipe.unet_params, pipe.vae,
                              pipe.vae_params)   # fresh jit cache
    got = np.asarray(pipe2._decode_tensor(z, TV))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_img2img_inpaint_mask(pipe, rng):
    """Masked redraw (A1111 semantics): mask==1 everywhere is a no-op;
    mask==0 everywhere pins the result to the init latent."""
    from mdu_tpu.models import sample_from_moments

    img = (rng.uniform(0, 255, size=(128, 128, 3))).astype(np.uint8)
    free = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=4,
                        tiled_diffusion=TD, decode=False)
    all_redraw = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=4,
                              tiled_diffusion=TD,
                              mask=np.ones((128, 128), np.float32), decode=False)
    np.testing.assert_allclose(np.asarray(all_redraw.latents),
                               np.asarray(free.latents), atol=1e-5)

    frozen = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=4,
                          tiled_diffusion=TD,
                          mask=np.zeros((128, 128), np.float32), decode=False)
    # with den == init everywhere, Euler's last step lands exactly on init
    from mdu_tpu.utils.image import image_to_tensor
    moments = pipe._encode(image_to_tensor(img), None)
    key = jax.random.PRNGKey(4)
    init = sample_from_moments(moments, jax.random.fold_in(key, 3))
    init = init * pipe.vae.cfg.scaling_factor
    np.testing.assert_allclose(np.asarray(frozen.latents), np.asarray(init),
                               rtol=1e-3, atol=1e-4)


def test_txt2img_batch(pipe):
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=11,
                       tiled_diffusion=TD, batch_size=2, decode=False)
    assert res.latents.shape[0] == 2
    # element 0 matches the single-image run with the same seed
    single = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=11,
                          tiled_diffusion=TD, decode=False)
    np.testing.assert_allclose(np.asarray(res.latents[:1]),
                               np.asarray(single.latents), atol=1e-5)
    # element 1 differs (its own seed)
    assert np.abs(np.asarray(res.latents[1]) - np.asarray(res.latents[0])).max() > 1e-3


def test_streaming_vae_through_pipeline(pipe):
    tv_stream = dataclasses.replace(TV, streaming=True, tile_batch=2)
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=42,
                       tiled_diffusion=TD, tiled_vae=tv_stream)
    ref = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=42,
                       tiled_diffusion=TD, tiled_vae=TV)
    assert res.images.shape == ref.images.shape
    # exact streaming == exact lockstep up to fp noise -> identical uint8 ±1
    assert np.abs(res.images.astype(int) - ref.images.astype(int)).max() <= 1


def test_mod_single_tile_equals_untiled(pipe):
    """MoD degenerate case: one tile covering the canvas fuses to exactly
    the plain denoiser output (gaussian * 1/gaussian == 1)."""
    from mdu_tpu.config import Method
    from mdu_tpu.tiling.schedulers import make_tiled_denoiser, plan_tiled_diffusion

    plan = plan_tiled_diffusion(Method.MIX_DIFF, 16, 16, tile_h=16, tile_w=16,
                                overlap=8, tile_bs=1)
    assert len(plan.bboxes) == 1
    fn = make_tiled_denoiser(plan, lambda f, s, i, bb, bi: 3.0 * f - 1.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 16, 16))
    out = jax.jit(fn)(x, jnp.asarray(1.0), jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out), 3.0 * np.asarray(x) - 1.0,
                               rtol=2e-5, atol=2e-5)


def test_region_seed_resolved_in_metadata(pipe):
    regions = [RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=-1)]
    td = dataclasses.replace(TD, regions=regions)
    res = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=7,
                       tiled_diffusion=td, region_conds=[(_cond(10), None)],
                       decode=False)
    info_seed = res.info["Tiled Diffusion"]["Region control"]["Region 1"]["seed"]
    assert info_seed != -1          # -1 must be replaced by the drawn seed


def test_reset_reports_and_clears(pipe):
    pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=1,
                 tiled_diffusion=TD, decode=False)
    assert len(pipe._jit_cache) > 0
    report = pipe.reset()
    assert pipe._jit_cache == {} and pipe.noise_inverse_cache is None
    assert "hbm_in_use_mb" in report


def test_noise_inverse_regional_reweighting(pipe, rng):
    """Regional inpainting + noise inversion without background: the fresh
    noise is reweighted from BG/FG regions before blending
    (ref abstractdiffusion.py:655-673)."""
    img = (rng.uniform(0, 255, size=(128, 128, 3))).astype(np.uint8)
    regions = [
        RegionSpec(0.0, 0.0, 0.5, 1.0, "left", seed=1),
        RegionSpec(0.5, 0.0, 0.5, 1.0, "right",
                   blend_mode=BlendMode.FOREGROUND, feather_ratio=0.4, seed=2),
    ]
    td = dataclasses.replace(
        TD, regions=regions, draw_background=False,
        noise_inverse=True, noise_inverse_steps=2,
        noise_inverse_renoise_strength=0.8, noise_inverse_renoise_kernel=8)
    rc = [(_cond(10), _cond(11)), (_cond(12), _cond(13))]
    res = pipe.img2img(img, _cond(0), _cond(1), sampler=SAMPLER, seed=9,
                       tiled_diffusion=td, region_conds=rc, decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    pipe.free_cache()


def test_img2img_latent_entry(pipe):
    """Pipeline chaining: img2img straight from latents (base -> refine)."""
    base = pipe.txt2img(_cond(0), _cond(1), 256, 128, SAMPLER, seed=1,
                        tiled_diffusion=TD, decode=False)
    refined = pipe.img2img(None, _cond(0), _cond(1), sampler=SAMPLER, seed=2,
                           tiled_diffusion=TD, init_latents=base.latents,
                           decode=False)
    assert refined.latents.shape == base.latents.shape
    assert np.isfinite(np.asarray(refined.latents)).all()
    # strength < 1 keeps the result anchored near the base
    import dataclasses as dc
    weak = pipe.img2img(None, _cond(0), _cond(1),
                        sampler=dc.replace(SAMPLER, denoising_strength=0.3),
                        seed=2, tiled_diffusion=TD, init_latents=base.latents,
                        decode=False)
    strong_d = np.abs(np.asarray(refined.latents) - np.asarray(base.latents)).mean()
    weak_d = np.abs(np.asarray(weak.latents) - np.asarray(base.latents)).mean()
    assert weak_d < strong_d


def test_interruption_skips_model(pipe):
    """With pipe.interrupted set, the per-step io_callback + lax.cond skip
    the UNet entirely: two runs with different conds produce identical
    latents (the model is never consulted), and clearing the flag restores
    normal cond-dependent generation."""
    pipe.interrupted = True
    try:
        a = pipe.txt2img(_cond(1), _cond(2), 128, 128, SAMPLER, seed=3,
                         tiled_diffusion=TD, decode=False)
        b = pipe.txt2img(_cond(4), _cond(5), 128, 128, SAMPLER, seed=3,
                         tiled_diffusion=TD, decode=False)
        np.testing.assert_array_equal(np.asarray(a.latents), np.asarray(b.latents))
        assert np.isfinite(np.asarray(a.latents)).all()
    finally:
        pipe.interrupted = False
    c = pipe.txt2img(_cond(1), _cond(2), 128, 128, SAMPLER, seed=3,
                     tiled_diffusion=TD, decode=False)
    d = pipe.txt2img(_cond(4), _cond(5), 128, 128, SAMPLER, seed=3,
                     tiled_diffusion=TD, decode=False)
    assert not np.allclose(np.asarray(c.latents), np.asarray(d.latents))
    assert not np.allclose(np.asarray(a.latents), np.asarray(c.latents))


def test_color_fix_plumbed_through_encode(pipe):
    """TiledVAEConfig.color_fix must change the fast-encoder program
    (regression: the pipeline dropped the flag on the floor, so the CLI's
    --color-fix was a silent no-op; ref tilevae.py:693)."""
    from mdu_tpu.tiling.tiled_vae import tiled_vae_encode_moments

    x = jax.random.uniform(jax.random.PRNGKey(9), (1, 3, 256, 256), minval=-1)
    tv = TiledVAEConfig(encoder_tile_size=96, decoder_tile_size=16,
                        fast_encoder=True, fast_decoder=True)
    plain = pipe._encode(x, tv)
    fixed = pipe._encode(x, dataclasses.replace(tv, color_fix=True))
    want = jax.jit(lambda v, a: tiled_vae_encode_moments(
        pipe.vae, v, a, tile_size=96, fast=True,
        color_fix=True))(pipe.vae_params, x)
    np.testing.assert_allclose(np.asarray(fixed), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(fixed), np.asarray(plain))
