"""Guided-filter retouch mask for noise inversion.

Numpy re-derivation of ref tile_utils/utils.py:216-247 ("get_retouch_mask"):
a guided filter of a grayscale image against itself with a k x k box blur;
the residual ``|gf - img|`` highlights high-frequency detail where original
noise is re-injected after inversion.  Host-side preprocessing (runs once per
img2img call), so plain numpy, not jnp.
"""
from __future__ import annotations

import numpy as np


def _box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """k x k normalized box filter with reflect-101 borders (cv2.blur semantics).

    Window for output index i covers input rows [i - k//2, i - k//2 + k - 1]
    (cv2 center anchor).  Implemented with an integral image: O(N) in pixels.
    """
    if k <= 1:
        return img.astype(np.float64)
    lo = k // 2
    hi = k - lo - 1
    # reflect-101 padding (no edge duplication), matching cv2 BORDER_DEFAULT
    padded = np.pad(img.astype(np.float64), ((lo, hi), (lo, hi)), mode="reflect")
    # summed-area table with a zero first row/col
    sat = np.zeros((padded.shape[0] + 1, padded.shape[1] + 1), dtype=np.float64)
    np.cumsum(padded, axis=0, out=sat[1:, 1:])
    np.cumsum(sat[1:, 1:], axis=1, out=sat[1:, 1:])
    h, w = img.shape
    s = (
        sat[k:k + h, k:k + w]
        - sat[0:h, k:k + w]
        - sat[k:k + h, 0:w]
        + sat[0:h, 0:w]
    )
    return s / float(k * k)


def get_retouch_mask(img_u8: np.ndarray, kernel_size: int) -> np.ndarray:
    """Guided-filter detail mask in [0, 1] from a grayscale uint8 image.

    Faithful to ref utils.py:216-247 (whose resize `step` is 1, making the
    resizes no-ops): mean/var/cov via box blur, ridge 0.01, then the
    round-trip through uint8 quantization of the residual.
    """
    img = img_u8.astype(np.float64) / 255.0
    mean_i = _box_blur(img, kernel_size)
    mean_ii = _box_blur(img * img, kernel_size)
    var_i = mean_ii - mean_i * mean_i
    # guide == source, so cov == var and the "b" term uses the same mean
    a = var_i / (var_i + 0.01)
    b = mean_i - a * mean_i
    gf = a * img + b
    gf = (gf - img) * 255.0
    gf = np.clip(gf, 0, 255).astype(np.uint8)  # quantization matches reference
    return gf.astype(np.float32) / 255.0
