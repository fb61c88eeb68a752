"""Resize/blur parity vs torch (the reference's F.interpolate / conv2d)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from mdu_tpu.ops import gaussian_blur_nchw, resize_nchw


@pytest.mark.parametrize("method,tmode", [
    ("nearest", "nearest-exact"),
    ("linear", "bilinear"),
    ("cubic", "bicubic"),
])
@pytest.mark.parametrize("shape_out", [(7, 13), (32, 48), (16, 16)])
def test_resize_matches_torch(rng, method, tmode, shape_out):
    x = rng.normal(size=(2, 4, 16, 24)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=shape_out, mode=tmode).numpy()
    got = np.asarray(resize_nchw(jnp.asarray(x), shape_out, method))
    atol = 2e-5 if method != "cubic" else 2e-3  # torch bicubic differs at borders
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_resize_upscale_matches_torch_bicubic(rng):
    x = rng.normal(size=(1, 4, 24, 24)).astype(np.float32)
    want = F.interpolate(torch.from_numpy(x), size=(48, 48), mode="bicubic").numpy()
    got = np.asarray(resize_nchw(jnp.asarray(x), (48, 48), "cubic"))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_gaussian_blur_matches_reference_conv(rng):
    """ref demofusion.py:164-178: full 2-D depthwise conv, zero padding."""
    x = rng.normal(size=(1, 4, 20, 28)).astype(np.float32)
    k, sigma = 5, 1.3

    xt = torch.from_numpy(x)
    coord = torch.arange(k, dtype=torch.float32)
    g1 = torch.exp(-((coord - (k - 1) / 2) ** 2) / (2 * sigma**2))
    g1 = g1 / g1.sum()
    g2 = g1[:, None] * g1[None, :]
    kernel = g2[None, None].repeat(4, 1, 1, 1)
    want = F.conv2d(xt, kernel, padding=k // 2, groups=4).numpy()

    got = np.asarray(gaussian_blur_nchw(jnp.asarray(x), k, sigma))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)
