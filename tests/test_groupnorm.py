"""Tiled GroupNorm == full GroupNorm (the Tiled VAE 'collective', ref
tilevae.py:207-245, 289-335)."""
import jax.numpy as jnp
import numpy as np

from mdu_tpu.ops import (
    apply_group_norm,
    combine_group_stats,
    combine_group_stats_reference,
    group_norm,
    group_stats,
)


def numpy_group_norm(x, G, weight, bias, eps=1e-6):
    B, C, H, W = x.shape
    xr = x.reshape(B, G, -1)
    mean = xr.mean(axis=2, keepdims=True)
    var = xr.var(axis=2, keepdims=True)
    out = ((xr - mean) / np.sqrt(var + eps)).reshape(B, C, H, W)
    return out * weight.reshape(1, C, 1, 1) + bias.reshape(1, C, 1, 1)


def test_plain_group_norm_matches_numpy(rng):
    x = rng.normal(size=(2, 8, 6, 10)).astype(np.float32) * 3 + 1
    w = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    got = group_norm(jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), numpy_group_norm(x, 4, w, b), rtol=2e-4, atol=2e-5)


def test_chanreduce_group_norm_matches_plain(rng):
    from mdu_tpu.ops.groupnorm import group_norm_chanreduce

    x = rng.normal(size=(3, 16, 7, 9)).astype(np.float32) * 2 - 0.5
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    want = np.asarray(group_norm(jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b)))
    got = np.asarray(group_norm_chanreduce(jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # affine-less path
    want = np.asarray(group_norm(jnp.asarray(x), 4))
    got = np.asarray(group_norm_chanreduce(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_tiled_stats_exactly_match_full(rng):
    """Disjoint owned regions + exact E[x²] pooling == full-tensor stats."""
    B, C, H, W = 2, 8, 16, 24
    G = 4
    x = rng.normal(size=(B, C, H, W)).astype(np.float32) * 5 - 2
    xj = jnp.asarray(x)

    # two tiles with halos, owned regions partition the canvas at col 12
    tiles = [xj[:, :, :, 0:16], xj[:, :, :, 8:24]]       # halo overlap cols 8..16
    masks = [np.zeros((H, 16), np.float32), np.zeros((H, 16), np.float32)]
    masks[0][:, 0:12] = 1    # owns cols 0..12
    masks[1][:, 4:16] = 1    # owns cols 12..24 (local coords 4..16)

    stats = [group_stats(t, G, mask=jnp.asarray(m)) for t, m in zip(tiles, masks)]
    means = jnp.stack([s[0] for s in stats])
    meansqs = jnp.stack([s[1] for s in stats])
    counts = jnp.stack([s[2] for s in stats])
    mean, var = combine_group_stats(means, meansqs, counts)

    fmean, fmeansq, _ = group_stats(xj, G)
    fvar = fmeansq - fmean * fmean
    np.testing.assert_allclose(np.asarray(mean), np.asarray(fmean), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(fvar), rtol=1e-4, atol=1e-5)


def test_tiled_norm_end_to_end_equals_full(rng):
    B, C, H, W = 1, 8, 16, 32
    G = 4
    x = rng.normal(size=(B, C, H, W)).astype(np.float32)
    w = rng.normal(size=(C,)).astype(np.float32)
    b = rng.normal(size=(C,)).astype(np.float32)
    xj = jnp.asarray(x)

    full = group_norm(xj, G, jnp.asarray(w), jnp.asarray(b))

    # 2 disjoint tiles (no halo) — apply with pooled stats must equal full
    t0, t1 = xj[:, :, :, :16], xj[:, :, :, 16:]
    s0, s1 = group_stats(t0, G), group_stats(t1, G)
    mean, var = combine_group_stats(
        jnp.stack([s0[0], s1[0]]), jnp.stack([s0[1], s1[1]]), jnp.stack([s0[2], s1[2]]))
    o0 = apply_group_norm(t0, G, mean, var, jnp.asarray(w), jnp.asarray(b))
    o1 = apply_group_norm(t1, G, mean, var, jnp.asarray(w), jnp.asarray(b))
    stitched = jnp.concatenate([o0, o1], axis=3)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full), rtol=2e-4, atol=2e-5)


def test_reference_pooling_close_but_biased(rng):
    """The reference's var pooling is approximate; ours is exact. Sanity-check
    both are in the same ballpark on equal-size tiles."""
    x = rng.normal(size=(1, 8, 16, 16)).astype(np.float32)
    xj = jnp.asarray(x)
    t0, t1 = xj[:, :, :8], xj[:, :, 8:]
    s0, s1 = group_stats(t0, 4), group_stats(t1, 4)
    v0 = s0[1] - s0[0] ** 2
    v1 = s1[1] - s1[0] ** 2
    mean_ref, var_ref = combine_group_stats_reference(
        jnp.stack([s0[0], s1[0]]), jnp.stack([v0, v1]), jnp.stack([s0[2], s1[2]]))
    mean_ex, var_ex = combine_group_stats(
        jnp.stack([s0[0], s1[0]]), jnp.stack([s0[1], s1[1]]), jnp.stack([s0[2], s1[2]]))
    np.testing.assert_allclose(np.asarray(mean_ref), np.asarray(mean_ex), rtol=1e-5)
    # ref var <= exact var (misses the between-tile mean spread term)
    assert (np.asarray(var_ref) <= np.asarray(var_ex) + 1e-6).all()


def test_group_norm_fold_matches_plain(rng):
    """MDU_GN=fold (no f32 activation temp — the DemoFusion scale-3
    compile-OOM fix) must match the plain path to f32 rounding."""
    from mdu_tpu.ops.groupnorm import group_norm, group_norm_fold

    x = rng.normal(size=(3, 32, 9, 11)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    b = rng.normal(size=(32,)).astype(np.float32)
    plain = group_norm(jnp.asarray(x), 8, jnp.asarray(w), jnp.asarray(b))
    fold = group_norm_fold(jnp.asarray(x), 8, jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(fold), np.asarray(plain),
                               rtol=2e-4, atol=2e-5)
    # bf16 activations keep their dtype
    fold16 = group_norm_fold(jnp.asarray(x, jnp.bfloat16), 8,
                             jnp.asarray(w), jnp.asarray(b))
    assert fold16.dtype == jnp.bfloat16
