"""Fusion primitive semantics vs direct transcriptions of the reference loops
(ref: multidiffusion.py:147-216, mixtureofdiffusers.py:104-126)."""
import jax.numpy as jnp
import numpy as np

from mdu_tpu.ops import (
    feather_blend,
    gather_tiles,
    scatter_add_tiles,
    weighted_average,
)
from mdu_tpu.utils import (
    BBox,
    feather_mask,
    gaussian_weights,
    paint_count,
    split_grid,
)


def test_gather_scatter_identity_single_tile(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 32, 48)).astype(np.float32))
    bb = [BBox(0, 0, 48, 32)]
    tiles = gather_tiles(x, bb)
    assert tiles.shape == (1, 2, 4, 32, 48)
    canvas = scatter_add_tiles(jnp.zeros_like(x), tiles, bb)
    np.testing.assert_array_equal(np.asarray(canvas), np.asarray(x))


def test_multidiffusion_uniform_average(rng):
    h, w = 64, 96
    bboxes = split_grid(w, h, 48, 48, 16)
    x = jnp.asarray(rng.normal(size=(1, 4, h, w)).astype(np.float32))
    weights = jnp.asarray(paint_count(w, h, bboxes))

    tiles = gather_tiles(x, bboxes)
    buf = scatter_add_tiles(jnp.zeros_like(x), tiles, bboxes)
    out = weighted_average(buf, weights)

    # identity denoiser => fused canvas must equal the input exactly
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_mixture_weights_partition_of_unity(rng):
    """MoD invariant: sum over tiles of gaussian_w * rescale == 1 per pixel,
    so a constant tile output fuses to that constant (ref mixtureofdiffusers.py:29-36)."""
    h, w = 96, 160
    tw = th = 64
    bboxes = split_grid(w, h, tw, th, 32)
    gw = gaussian_weights(tw, th)
    total = paint_count(w, h, bboxes, init_weight=gw)      # Σ gaussian weights
    rescale = 1.0 / total

    const = 3.25
    tiles = jnp.full((len(bboxes), 1, 4, th, tw), const, dtype=jnp.float32)
    per_tile = [jnp.asarray(gw * rescale[0, 0, b.y:b.y + b.h, b.x:b.x + b.w]) for b in bboxes]
    buf = scatter_add_tiles(jnp.zeros((1, 4, h, w), jnp.float32), tiles, bboxes,
                            per_tile_weights=per_tile)
    np.testing.assert_allclose(np.asarray(buf), const, rtol=1e-5)


def test_feather_blend_reference_parity(rng):
    h, w = 32, 32
    x_out = rng.normal(size=(1, 4, h, w)).astype(np.float32)
    fb = rng.normal(size=(1, 4, h, w)).astype(np.float32)
    fm = np.abs(rng.normal(size=(1, 1, h, w))).astype(np.float32)
    fc = rng.integers(0, 3, size=(1, 1, h, w)).astype(np.float32)

    # direct transcription (ref multidiffusion.py:211-216); max(fc,1) keeps
    # the dead branch of np.where from emitting divide-by-zero warnings
    fc_safe = np.maximum(fc, 1.0)
    buf = np.where(fc > 1, fb / fc_safe, fb)
    msk = np.where(fc > 1, fm / fc_safe, fm)
    expect = np.where(fc > 0, x_out * (1 - msk) + buf * msk, x_out)

    got = feather_blend(jnp.asarray(x_out), jnp.asarray(fb), jnp.asarray(fm), jnp.asarray(fc))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-6)


def test_feather_mask_shape():
    m = feather_mask(48, 32, 0.4)
    assert m.shape == (32, 48)
