"""Fusion weight golden parity (ref: tile_utils/utils.py:180-214)."""
import numpy as np

from mdu_tpu.utils import feather_mask, gaussian_weights, paint_count, split_grid


def reference_gaussian(tile_w, tile_h):
    """Direct transcription of the reference formula (utils.py:180-194)."""
    from numpy import exp, pi, sqrt

    f = lambda x, midpoint, var=0.01: exp(-(x - midpoint) * (x - midpoint) / (tile_w * tile_w) / (2 * var)) / sqrt(2 * pi * var)
    x_probs = [f(x, (tile_w - 1) / 2) for x in range(tile_w)]
    y_probs = [f(y, tile_h / 2) for y in range(tile_h)]
    return np.outer(y_probs, x_probs).astype(np.float32)


def reference_feather(w, h, ratio):
    """Direct transcription of the reference loop (utils.py:196-214)."""
    mask = np.ones((h, w), dtype=np.float32)
    feather_radius = int(min(w // 2, h // 2) * ratio)
    for i in range(h // 2):
        for j in range(w // 2):
            dist = min(i, j)
            if dist >= feather_radius:
                continue
            weight = (dist / feather_radius) ** 2
            mask[i, j] = weight
            mask[i, w - j - 1] = weight
            mask[h - i - 1, j] = weight
            mask[h - i - 1, w - j - 1] = weight
    return mask


def test_gaussian_parity():
    for (tw, th) in [(96, 96), (64, 96), (17, 33), (128, 128)]:
        np.testing.assert_allclose(
            gaussian_weights(tw, th), reference_gaussian(tw, th), rtol=1e-6)


def test_gaussian_midpoint_asymmetry():
    w = gaussian_weights(8, 8)
    # x axis peaks between 3 and 4 (midpoint 3.5): symmetric across center
    np.testing.assert_allclose(w[:, 3], w[:, 4], rtol=1e-6)
    # y axis midpoint is 4.0 exactly: row 4 is the unique max
    assert w[4, 3] > w[3, 3] and w[4, 3] > w[5, 3]


def test_gaussian_strictly_positive():
    assert (gaussian_weights(96, 96) > 0).all()


def test_feather_parity():
    for (w, h, r) in [(32, 32, 0.2), (64, 32, 0.5), (33, 17, 0.8), (16, 16, 0.0)]:
        np.testing.assert_allclose(feather_mask(w, h, r), reference_feather(w, h, r))


def test_feather_edges_low_center_high():
    m = feather_mask(64, 64, 0.5)
    assert m[0, 0] == 0.0
    assert m[32, 32] == 1.0


def test_paint_count_with_gaussian_init():
    bboxes = split_grid(256, 96, 96, 96, 48)
    count = paint_count(256, 96, bboxes, init_weight=gaussian_weights(96, 96))
    assert (count > 0).all()
