"""Tiled VAE: plan geometry + tiled-vs-untiled output parity
(ref scripts/tilevae.py; SURVEY.md §4 integration bar)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mdu_tpu.models import AutoencoderKL, random_params, tiny_vae_config
from mdu_tpu.tiling import (
    plan_vae_tiles,
    tiled_vae_decode,
    tiled_vae_encode_moments,
)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = AutoencoderKL(tiny_vae_config())
    x = jnp.zeros((1, 3, 64, 64))
    params = random_params(vae, 7, x, jax.random.PRNGKey(0))
    return vae, params


def test_plan_owned_partition():
    plan = plan_vae_tiles(96, 160, 48, 11)
    canvas = np.zeros((96, 160), np.int32)
    for (y0, y1, x0, x1) in plan.owned:
        canvas[y0:y1, x0:x1] += 1
    assert (canvas == 1).all(), "owned regions must partition the canvas exactly"


def test_plan_uniform_tiles_inside_canvas():
    plan = plan_vae_tiles(96, 160, 48, 11)
    for (oy, ox) in plan.in_origins:
        assert 0 <= oy <= 96 - plan.in_h
        assert 0 <= ox <= 160 - plan.in_w


def test_plan_bypass_small_input():
    assert plan_vae_tiles(64, 64, 96, 11) is None


def test_plan_owned_inside_input_tile():
    plan = plan_vae_tiles(200, 104, 48, 11)
    for (oy, ox), (y0, y1, x0, x1) in zip(plan.in_origins, plan.owned):
        assert oy <= y0 and y1 <= oy + plan.in_h
        assert ox <= x0 and x1 <= ox + plan.in_w


def test_tiled_decode_matches_untiled(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 48, 48)) * 0.5
    full = jax.jit(lambda z: vae.apply(params, z, method=vae.decode))(z)
    tiled = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    assert tiled.shape == full.shape
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    # halo 11 bounds the conv receptive-field mismatch; per-tile attention is
    # the same approximation the reference makes
    assert err.mean() < 0.02, f"mean err {err.mean()}"
    assert np.median(err) < 0.01


def test_tiled_encode_matches_untiled(vae_and_params):
    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 256, 256)) * 0.3
    full = jax.jit(lambda x: vae.apply(params, x, method=vae.encode_moments))(x)
    tiled = jax.jit(lambda x: tiled_vae_encode_moments(vae, params, x, tile_size=128))(x)
    assert tiled.shape == full.shape
    err = np.abs(np.asarray(tiled) - np.asarray(full))
    assert err.mean() < 0.05, f"mean err {err.mean()}"


def test_fast_mode_decode_close_to_exact(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 48, 48)) * 0.5
    exact = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    fast = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24, fast=True,
                                              tile_batch=2))(z)
    assert fast.shape == exact.shape
    assert np.isfinite(np.asarray(fast)).all()
    # estimated stats shift outputs but must stay in the same regime
    assert np.abs(np.asarray(fast) - np.asarray(exact)).mean() < 0.2


def test_reference_pooling_mode_runs(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 48, 48)) * 0.5
    out = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24,
                                             reference_pooling=True))(z)
    assert np.isfinite(np.asarray(out)).all()


def test_batch_dimension(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 48, 48)) * 0.5
    out = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    assert out.shape == (2, 3, 384, 384)
    # each batch element decodes independently
    single = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z[:1])
    np.testing.assert_allclose(np.asarray(out[:1]), np.asarray(single),
                               rtol=1e-4, atol=1e-5)


def test_color_fix_encode(vae_and_params):
    from mdu_tpu.tiling import tiled_vae_encode_moments

    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 256, 256)) * 0.3
    out = jax.jit(lambda x: tiled_vae_encode_moments(
        vae, params, x, tile_size=128, fast=True, color_fix=True))(x)
    exact = jax.jit(lambda x: tiled_vae_encode_moments(
        vae, params, x, tile_size=128))(x)
    assert out.shape == exact.shape
    assert np.isfinite(np.asarray(out)).all()
    # hybrid mode sits between fast and exact; loose sanity bound
    assert np.abs(np.asarray(out) - np.asarray(exact)).mean() < 0.5


def test_streaming_decode_matches_lockstep(vae_and_params):
    """Fixed-HBM streaming exact mode == lockstep exact mode (same pooled
    stats math, host-resident tiles)."""
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 48, 48)) * 0.5
    lockstep = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    streamed = streaming_tiled_vae(vae, params, z, "decoder", tile_size=24,
                                   group_size=2)
    assert streamed is not None
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(lockstep),
                               rtol=2e-4, atol=2e-4)


def test_streaming_encode_matches_lockstep(vae_and_params):
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    vae, params = vae_and_params
    x = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 256, 256)) * 0.3
    lockstep = jax.jit(lambda x: tiled_vae_encode_moments(vae, params, x,
                                                          tile_size=128))(x)
    streamed = streaming_tiled_vae(vae, params, x, "encoder", tile_size=128,
                                   group_size=2)
    assert streamed is not None
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(lockstep),
                               rtol=3e-4, atol=3e-4)


def test_device_resident_streaming_matches_lockstep(vae_and_params):
    """Device-resident grouped streaming (host_resident=False: tiles stay in
    HBM, segments run per group) == lockstep exact, decode and encode."""
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 48, 48)) * 0.5
    lockstep = jax.jit(lambda z: tiled_vae_decode(vae, params, z, tile_size=24))(z)
    streamed = streaming_tiled_vae(vae, params, z, "decoder", tile_size=24,
                                   group_size=2, host_resident=False)
    assert streamed is not None
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(lockstep),
                               rtol=2e-4, atol=2e-4)

    x = jax.random.normal(jax.random.PRNGKey(12), (1, 3, 256, 256)) * 0.3
    lock_e = jax.jit(lambda x: tiled_vae_encode_moments(vae, params, x,
                                                        tile_size=128))(x)
    stream_e = streaming_tiled_vae(vae, params, x, "encoder", tile_size=128,
                                   group_size=2, host_resident=False)
    assert stream_e is not None
    np.testing.assert_allclose(np.asarray(stream_e), np.asarray(lock_e),
                               rtol=3e-4, atol=3e-4)


def test_streaming_fp8_spill_close_to_exact(vae_and_params):
    """Compressed (float8_e4m3fn) inter-segment spills stay close to the
    uncompressed stream-host decode: GroupNorm stats are pooled
    pre-compression, so quantization error does not accumulate across
    segments.  The final segment's output is never compressed."""
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(11), (1, 4, 48, 48)) * 0.5
    exact = streaming_tiled_vae(vae, params, z, "decoder", tile_size=24,
                                group_size=2)
    fp8 = streaming_tiled_vae(vae, params, z, "decoder", tile_size=24,
                              group_size=2, spill_dtype="float8_e4m3fn")
    assert fp8 is not None and np.asarray(fp8).dtype == np.asarray(exact).dtype
    err = np.abs(np.asarray(fp8, np.float32) - np.asarray(exact, np.float32))
    assert np.isfinite(np.asarray(fp8, np.float32)).all()
    # e4m3 carries ~6% relative precision per spill and this random-weight
    # tiny VAE is a worst case (no trained-decoder smoothness); measured
    # 0.08 mean here vs [-1,1] outputs.  The bound pins the order of
    # magnitude — real-weight drift is far smaller, and the mode is
    # documented lossy (transport-bandwidth lever, not a fidelity mode).
    assert err.mean() < 0.12, err.mean()

    # a same-width spill dtype is a no-op (f32 test params -> f32 spills
    # would be lossy only if narrower; fp32 spill must be bitwise-identical)
    same = streaming_tiled_vae(vae, params, z, "decoder", tile_size=24,
                               group_size=2, spill_dtype="float32")
    np.testing.assert_array_equal(np.asarray(same), np.asarray(exact))


def test_streaming_bypass_small():
    from mdu_tpu.models import AutoencoderKL, random_params, tiny_vae_config
    from mdu_tpu.tiling.streaming_vae import streaming_tiled_vae

    vae = AutoencoderKL(tiny_vae_config())
    params = random_params(vae, 0, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    assert streaming_tiled_vae(vae, params, jnp.zeros((1, 4, 16, 16)),
                               "decoder", tile_size=96) is None


def test_decode_nan_recovery_chain(vae_and_params):
    """NaN decode -> fast-stats retry -> cheap latent approximation
    (ref tilevae.py:500-503, 570-573, 625; VERDICT item 7)."""
    from mdu_tpu.config import TiledVAEConfig
    from mdu_tpu.models import UNet2DCondition, random_params as rp, tiny_unet_config
    from mdu_tpu.pipeline import DiffusionPipeline

    vae, params = vae_and_params
    # poison every decoder conv bias -> decode is NaN in exact AND fast mode
    poisoned = jax.tree.map(lambda a: a, params)
    from flax import traverse_util
    flat = traverse_util.flatten_dict(poisoned["params"], sep="/")
    for k in flat:
        if k.startswith("decoder/conv_out"):
            flat[k] = jnp.full_like(flat[k], jnp.nan)
    poisoned = {"params": traverse_util.unflatten_dict(flat, sep="/")}

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    up = rp(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
            jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    pipe = DiffusionPipeline(unet, up, vae, poisoned)

    z = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 24, 24)) * 0.2
    tv = TiledVAEConfig(decoder_tile_size=16, fast_decoder=False)
    img = pipe._decode(z, tv)
    assert img.shape == (1, 192, 192, 3)
    assert np.isfinite(img).all(), "cheap approximation must be finite"

    # healthy params take the normal path and differ from the approximation
    pipe_ok = DiffusionPipeline(unet, up, vae, params)
    img_ok = pipe_ok._decode(z, tv)
    assert np.isfinite(img_ok).all()
    assert np.abs(img_ok.astype(int) - img.astype(int)).max() > 2


def test_auto_group_size_clamps_to_budget(monkeypatch):
    """Streaming group sizing honors MDU_HBM_BYTES: the group shrinks first,
    then prefetch double-buffering is dropped (round-3 8K-OOM postmortem:
    tiling/streaming_vae.py::auto_group_size)."""
    from mdu_tpu.tiling.streaming_vae import auto_group_size

    # roomy budget: requested group and prefetch survive
    monkeypatch.setenv("MDU_HBM_BYTES", str(64 * 2 ** 30))
    g, pf = auto_group_size("decoder", 256, 256, 1, 4, True)
    assert (g, pf) == (4, True)

    # 8K-decode-like working set vs a 1 GiB budget: group drops to 1 and
    # prefetch is sacrificed rather than giving up
    monkeypatch.setenv("MDU_HBM_BYTES", str(1 * 2 ** 30))
    g, pf = auto_group_size("decoder", 8192, 1088, 1, 4, True)
    assert g == 1 and pf is False

    # mid budget: group shrinks, prefetch kept
    monkeypatch.setenv("MDU_HBM_BYTES", str(8 * 2 ** 30))
    g, pf = auto_group_size("decoder", 2048, 1088, 1, 4, True)
    assert 1 <= g < 4 and pf is True
