"""Image conversion + preview utilities."""
import jax.numpy as jnp
import numpy as np

from mdu_tpu.utils import (
    cheap_latent_preview,
    grayscale_u8,
    image_to_tensor,
    tensor_to_image,
)


def test_image_tensor_roundtrip(rng):
    img = rng.integers(0, 256, size=(32, 48, 3)).astype(np.uint8)
    t = image_to_tensor(img)
    assert t.shape == (1, 3, 32, 48)
    assert float(t.min()) >= -1.0 and float(t.max()) <= 1.0
    back = tensor_to_image(t)[0]
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


def test_alpha_flattening(rng):
    rgba = rng.integers(0, 256, size=(8, 8, 4)).astype(np.uint8)
    rgba[..., 3] = 0                     # fully transparent -> white
    t = image_to_tensor(rgba)
    np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-6)


def test_grayscale():
    img = np.zeros((4, 4, 3), np.uint8)
    img[..., 1] = 255                    # pure green
    g = grayscale_u8(img)
    assert g.shape == (4, 4)
    assert abs(int(g[0, 0]) - 150) <= 1  # 0.587 * 255


def test_cheap_latent_preview(rng):
    z = jnp.asarray(rng.normal(size=(2, 4, 8, 8)).astype(np.float32))
    rgb = cheap_latent_preview(z)
    assert rgb.shape == (2, 3, 8, 8)
    assert np.isfinite(np.asarray(rgb)).all()
