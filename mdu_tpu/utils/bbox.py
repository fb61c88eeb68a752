"""Tile rectangles — static Python geometry resolved at trace time.

TPU-native restatement of the reference's grid/region bboxes
(ref: tile_utils/utils.py:69-99).  All coordinates are plain ints computed
*outside* jit so every kernel sees static shapes; a ``BBox`` never holds a
traced value.  The torch ``slicer`` tuple becomes an explicit ``(y, x)``
offset pair consumed by ``lax.dynamic_slice`` with constant indices, which
XLA folds into static slices.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum
from typing import Tuple


class BlendMode(str, Enum):
    """Region layer type (ref: tile_utils/utils.py:36-39)."""

    FOREGROUND = "Foreground"
    BACKGROUND = "Background"


@dataclass(frozen=True)
class BBox:
    """A latent-space tile rectangle. ``box`` is (x0, y0, x1, y1)."""

    x: int
    y: int
    w: int
    h: int

    @property
    def box(self) -> Tuple[int, int, int, int]:
        return (self.x, self.y, self.x + self.w, self.y + self.h)

    @property
    def slicer(self) -> Tuple[slice, slice, slice, slice]:
        """NCHW slicing tuple, mirroring the reference's ``BBox.slicer``."""
        return (
            slice(None),
            slice(None),
            slice(self.y, self.y + self.h),
            slice(self.x, self.x + self.w),
        )

    def __getitem__(self, idx: int) -> int:
        return self.box[idx]


@dataclass(frozen=True)
class RegionSpec:
    """User-facing region prompt control settings, in *relative* [0,1] coords.

    Mirrors the reference's 10-field ``BBoxSettings`` namedtuple
    (ref: tile_utils/utils.py:41-43) minus ``enable`` (disabled regions are
    simply not passed in).
    """

    x: float
    y: float
    w: float
    h: float
    prompt: str = ""
    neg_prompt: str = ""
    blend_mode: BlendMode = BlendMode.BACKGROUND
    feather_ratio: float = 0.2
    seed: int = -1

    def validate(self) -> bool:
        """Sanity check mirroring ref tile_utils/utils.py:61."""
        return not (self.x > 1.0 or self.y > 1.0 or self.w <= 0.0 or self.h <= 0.0)

    def to_bbox(self, latent_w: int, latent_h: int) -> "RegionBBox":
        """Resolve relative coords to a latent-space pixel bbox.

        Rounding policy matches ref tile_methods/abstractdiffusion.py:207-214:
        floor for origin, ceil for size, then clamp into the canvas.
        """
        x = max(0, int(self.x * latent_w))
        y = max(0, int(self.y * latent_h))
        w = min(latent_w - x, math.ceil(self.w * latent_w))
        h = min(latent_h - y, math.ceil(self.h * latent_h))
        return RegionBBox(
            x=x, y=y, w=w, h=h,
            prompt=self.prompt,
            neg_prompt=self.neg_prompt,
            blend_mode=self.blend_mode,
            feather_ratio=max(0.0, min(1.0, self.feather_ratio)),
            seed=self.seed,
        )


@dataclass(frozen=True)
class RegionBBox(BBox):
    """A resolved region-control bbox (ref CustomBBox, tile_utils/utils.py:84-99)."""

    prompt: str = ""
    neg_prompt: str = ""
    blend_mode: BlendMode = BlendMode.BACKGROUND
    feather_ratio: float = 0.2
    seed: int = -1
