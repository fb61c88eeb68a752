"""Grid splitter properties + golden parity with the reference placement math
(ref: tile_utils/utils.py:151-177)."""
import math

import numpy as np
import pytest

from mdu_tpu.utils import BBox, batch_bboxes, paint_count, split_grid, splitable


def reference_split(w, h, tile_w, tile_h, overlap):
    """Direct transcription of the reference's placement formulas for parity.

    One deliberate deviation: the last row/col is pinned to the canvas edge
    (the reference's ``int(row*dy)`` can land 1px short under float
    truncation, leaving the final pixel row unpainted — see
    utils/grid.py::split_grid)."""
    cols = math.ceil((w - overlap) / (tile_w - overlap))
    rows = math.ceil((h - overlap) / (tile_h - overlap))
    dx = (w - tile_w) / (cols - 1) if cols > 1 else 0
    dy = (h - tile_h) / (rows - 1) if rows > 1 else 0
    out = []
    for row in range(rows):
        y = (h - tile_h) if row == rows - 1 else min(int(row * dy), h - tile_h)
        for col in range(cols):
            x = (w - tile_w) if col == cols - 1 else min(int(col * dx), w - tile_w)
            out.append((x, y, tile_w, tile_h))
    return out


@pytest.mark.parametrize("w,h,tw,th,ov", [
    (64, 64, 96, 96, 48),      # tile larger than canvas -> single clamped tile
    (256, 64, 96, 96, 48),     # panorama config 2 shape (2048x512 px)
    (512, 512, 96, 96, 48),    # 4K-latent canvas
    (1024, 1024, 96, 96, 8),   # 8K-latent, img2img overlap default
    (96, 96, 96, 96, 48),      # exact fit
    (100, 100, 96, 96, 48),    # tiny remainder
    (130, 70, 64, 48, 16),     # asymmetric
])
def test_parity_with_reference_math(w, h, tw, th, ov):
    tw_c, th_c = min(tw, w), min(th, h)
    got = [(b.x, b.y, b.w, b.h) for b in split_grid(w, h, tw_c, th_c, ov)]
    assert got == reference_split(w, h, tw_c, th_c, ov)


def test_full_coverage():
    for (w, h, tw, th, ov) in [(512, 512, 96, 96, 48), (257, 129, 96, 96, 8)]:
        count = paint_count(w, h, split_grid(w, h, tw, th, ov))
        assert (count > 0).all(), "every latent pixel must be painted"


def test_tiles_stay_in_bounds():
    for b in split_grid(250, 130, 96, 96, 32):
        assert 0 <= b.x and b.x + b.w <= 250
        assert 0 <= b.y and b.y + b.h <= 130


def test_splitable():
    assert not splitable(96, 96, 96, 96, 48)
    assert splitable(256, 64, 96, 96, 48)
    assert splitable(64, 256, 96, 96, 48)


def test_batching_is_balanced():
    bboxes = split_grid(512, 512, 96, 96, 48)
    batches = batch_bboxes(bboxes, 4)
    sizes = [len(b) for b in batches]
    assert sum(sizes) == len(bboxes)
    assert max(sizes) - min(sizes) <= 1 or sizes[-1] <= sizes[0]
    assert max(sizes) <= 4


def test_bbox_slicer_matches_offsets():
    b = BBox(3, 5, 7, 11)
    x = np.arange(4 * 2 * 32 * 32).reshape(4, 2, 32, 32)
    np.testing.assert_array_equal(x[b.slicer], x[:, :, 5:16, 3:10])
    assert b.box == (3, 5, 10, 16)


def test_8k_scale_plan_geometry():
    """8K img2img geometry: 1024x1024 latent, default img2img knobs
    (tile 96, overlap 8 — ref tilediffusion.py:127-132)."""
    from mdu_tpu.config import Method
    from mdu_tpu.tiling.schedulers import plan_tiled_diffusion

    plan = plan_tiled_diffusion(Method.MULTI_DIFF, 1024, 1024,
                                tile_h=96, tile_w=96, overlap=8, tile_bs=8)
    assert plan.num_batches == -(-len(plan.bboxes) // 8)
    assert (plan.weights > 0).all()
    assert len(plan.bboxes) == 144        # 12x12 grid at stride 88


def test_8k_vae_plan_geometry():
    from mdu_tpu.tiling import plan_vae_tiles

    plan = plan_vae_tiles(1024, 1024, 96, 11)     # 8K latent decode
    cover = np.zeros((1024, 1024), np.int32)
    for (y0, y1, x0, x1) in plan.owned:
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()
    assert plan.in_h <= 96 + 22 and plan.in_w <= 96 + 22

    plan_enc = plan_vae_tiles(8192, 8192, 1536, 32)   # 8K pixel encode
    cover = np.zeros((8192, 8192), np.int8)
    for (y0, y1, x0, x1) in plan_enc.owned:
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()
    # origins aligned for 3 stride-2 mask subsamplings
    for (oy, ox) in plan_enc.in_origins:
        assert oy % 8 == 0 and ox % 8 == 0
