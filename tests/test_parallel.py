"""Multi-device sharding tests on the 8-virtual-CPU mesh.

North star (BASELINE.md): tile-sharded step equals single-device step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.config import Method
from mdu_tpu.parallel import (
    make_sharded_tile_denoiser,
    make_tile_mesh,
    make_train_mesh,
    make_train_step,
    param_shardings,
)
from mdu_tpu.tiling.schedulers import make_tiled_denoiser, plan_tiled_diffusion

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_sharded_tile_denoiser_matches_single_device(rng):
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 64, 96, tile_h=32, tile_w=32,
                                overlap=16, tile_bs=2)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 96)).astype(np.float32))

    def per_tile(tiles, sigma):
        return 2.0 * tiles + sigma            # deterministic pseudo-denoiser

    mesh = make_tile_mesh(8)
    sharded = make_sharded_tile_denoiser(mesh, plan, per_tile)

    def single_tile_denoise(flat, sigma, step, bboxes, batch_i):
        return 2.0 * flat + sigma

    single = make_tiled_denoiser(plan, single_tile_denoise)
    s = jnp.asarray(0.5)
    out_sharded = jax.jit(sharded)(x, s, jnp.asarray(0))
    out_single = jax.jit(single)(x, s, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_single),
                               rtol=1e-6, atol=1e-6)


def test_sharded_vae_groupnorm_psum(rng):
    """Tile-sharded GroupNorm stats psum == unsharded pooled stats."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdu_tpu.ops.tile_context import TileContext, tile_group_norm

    T, B, C, h, w = 8, 1, 8, 8, 8
    x = jnp.asarray(rng.normal(size=(T * B, C, h, w)).astype(np.float32))
    masks = jnp.ones((T, 1, h, w), jnp.float32)
    weight = jnp.ones((C,))
    bias = jnp.zeros((C,))

    ctx_local = TileContext(T, (h, w), masks)
    ref = tile_group_norm(x, 4, weight, bias, ctx_local)

    mesh = make_tile_mesh(8)
    ctx_shard = TileContext(1, (h, w), None, axis_name="tiles")

    def body(xs, ms):
        c = TileContext(1, (h, w), ms, axis_name="tiles")
        return tile_group_norm(xs, 4, weight, bias, c)

    fn = jax.shard_map(body, mesh=mesh, in_specs=(P("tiles"), P("tiles")),
                       out_specs=P("tiles"))
    got = fn(x, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_train_step_dp_tp(rng):
    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    mesh = make_train_mesh(dp=4, tp=2)
    B, L = 4, 7
    lat = jnp.asarray(rng.normal(size=(B, 4, 16, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, L, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, lat[:1], jnp.zeros((1,)), ctx[:1])

    init_state, jitted = make_train_step(unet, mesh)
    with mesh:
        params, opt_state, p_shard = init_state(params)
        step = jitted(p_shard)
        batch = {"latents": lat, "context": ctx}
        params2, opt_state, loss = step(params, opt_state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # params actually changed
    l0 = jax.tree.leaves(params2)[0]
    assert np.isfinite(np.asarray(l0)).all()


def test_tp_param_shardings_cover_attention(rng):
    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config
    from jax.sharding import PartitionSpec as P

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    params = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                           jnp.zeros((1, 7, cfg.cross_attention_dim)))
    mesh = make_train_mesh(dp=4, tp=2)
    sh = param_shardings(params["params"], mesh)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(sh, sep="/")
    tp_specs = [k for k, v in flat.items() if v.spec != P()]
    assert any("to_q" in k for k in tp_specs), "attention q proj must be TP-sharded"
    assert any("ff" in k or "fc" in k or "proj" in k for k in tp_specs)


def test_sharded_tiled_vae_decode_matches_single(rng):
    import jax.numpy as jnp

    from mdu_tpu.models import AutoencoderKL, random_params, tiny_vae_config
    from mdu_tpu.parallel.sharded import sharded_tiled_vae_decode
    from mdu_tpu.tiling import tiled_vae_decode

    vae = AutoencoderKL(tiny_vae_config())
    params = random_params(vae, 7, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    z = jnp.asarray(rng.normal(size=(1, 4, 48, 48)).astype(np.float32)) * 0.5

    single = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    mesh = make_tile_mesh(8)
    sharded = jax.jit(lambda z: sharded_tiled_vae_decode(mesh, vae, params, z,
                                                         tile_size=24))(z)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=2e-4, atol=2e-4)


def test_sharded_mod_denoiser_matches_single_device(rng):
    plan = plan_tiled_diffusion(Method.MIX_DIFF, 64, 96, tile_h=32, tile_w=32,
                                overlap=16, tile_bs=2)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 96)).astype(np.float32))

    mesh = make_tile_mesh(8)
    sharded = make_sharded_tile_denoiser(mesh, plan, lambda t, s: 2.0 * t + s)
    single = make_tiled_denoiser(plan, lambda f, s, i, bb, bi: 2.0 * f + s)
    s = jnp.asarray(0.5)
    out_sharded = jax.jit(sharded)(x, s, jnp.asarray(0))
    out_single = jax.jit(single)(x, s, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(out_sharded), np.asarray(out_single),
                               rtol=1e-5, atol=1e-5)


def test_train_step_with_remat(rng):
    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    mesh = make_train_mesh(dp=2, tp=1)
    lat = jnp.asarray(rng.normal(size=(2, 4, 16, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 7, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, lat[:1], jnp.zeros((1,)), ctx[:1])
    init_state, jitted = make_train_step(unet, mesh, remat=True)
    with mesh:
        params, opt_state, p_shard = init_state(params)
        step = jitted(p_shard)
        _, _, loss = step(params, opt_state, {"latents": lat, "context": ctx},
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_sharded_fusion_deterministic(rng):
    """North star 'bitwise-stable blending': the sharded fused canvas is
    bitwise identical across runs (fixed accumulation order per device +
    deterministic psum)."""
    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 64, 96, tile_h=32, tile_w=32,
                                overlap=16, tile_bs=2)
    x = jnp.asarray(rng.normal(size=(1, 4, 64, 96)).astype(np.float32))
    mesh = make_tile_mesh(8)
    den = make_sharded_tile_denoiser(mesh, plan, lambda t, s: jnp.sin(t) * 1.7 + s)
    f = jax.jit(den)
    a = np.asarray(f(x, jnp.asarray(0.3), jnp.asarray(0)))
    b = np.asarray(f(x, jnp.asarray(0.3), jnp.asarray(0)))
    np.testing.assert_array_equal(a, b)


def test_train_step_v_prediction(rng):
    import dataclasses

    from mdu_tpu.models import UNet2DCondition, random_params, tiny_unet_config
    from mdu_tpu.samplers import NoiseSchedule

    cfg = tiny_unet_config()
    unet = UNet2DCondition(cfg)
    mesh = make_train_mesh(dp=2, tp=1)
    sch = dataclasses.replace(NoiseSchedule(), prediction_type="v_prediction")
    lat = jnp.asarray(rng.normal(size=(2, 4, 16, 16)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 7, cfg.cross_attention_dim)).astype(np.float32))
    params = random_params(unet, 0, lat[:1], jnp.zeros((1,)), ctx[:1])
    init_state, jitted = make_train_step(unet, mesh, schedule=sch)
    with mesh:
        params, opt_state, p_shard = init_state(params)
        step = jitted(p_shard)
        _, _, loss = step(params, opt_state, {"latents": lat, "context": ctx},
                          jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
