"""ESRGAN (RRDBNet) upscaler model + checkpoint loading + registry hook."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from mdu_tpu.models.esrgan import (
    RRDBNet,
    RRDBNetConfig,
    load_esrgan,
    register_esrgan_upscaler,
    tiny_rrdb_config,
    translate_esrgan_name,
)
from mdu_tpu.models import random_params


def test_rrdbnet_x4_shapes():
    cfg = tiny_rrdb_config()
    model = RRDBNet(cfg)
    x = jnp.ones((1, 3, 16, 16)) * 0.5
    params = random_params(model, 0, x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (1, 3, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_esrgan_translation_keys():
    cfg = tiny_rrdb_config()
    model = RRDBNet(cfg)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.zeros((1, 3, 8, 8))))
    names = traverse_util.flatten_dict(shapes["params"], sep="/")
    keys = {translate_esrgan_name(n) for n in names}
    for k in ["conv_first.weight", "body.0.rdb1.conv1.weight",
              "body.1.rdb3.conv5.bias", "conv_body.weight",
              "conv_up1.weight", "conv_hr.bias", "conv_last.weight"]:
        assert k in keys, f"missing {k}"


def test_load_esrgan_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    cfg = tiny_rrdb_config()
    model = RRDBNet(cfg)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.zeros((1, 3, 8, 8))))
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    rng = np.random.default_rng(0)
    state = {translate_esrgan_name(n): (rng.normal(size=l.shape) * 0.05).astype(np.float32)
             for n, l in flat.items()}
    path = str(tmp_path / "esrgan.safetensors")
    save_file(state, path)

    m, params = load_esrgan(path, cfg)
    got = traverse_util.flatten_dict(params["params"], sep="/")
    for n in flat:
        np.testing.assert_array_equal(np.asarray(got[n]),
                                      state[translate_esrgan_name(n)])


def test_registered_esrgan_through_pipeline(tmp_path):
    from safetensors.numpy import save_file

    from mdu_tpu.upscale import get_upscaler

    cfg = tiny_rrdb_config()
    model = RRDBNet(cfg)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.zeros((1, 3, 8, 8))))
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    rng = np.random.default_rng(1)
    state = {translate_esrgan_name(n): (rng.normal(size=l.shape) * 0.02).astype(np.float32)
             for n, l in flat.items()}
    path = str(tmp_path / "g.safetensors")
    save_file(state, path)

    register_esrgan_upscaler("TestGAN-tiny", path, )
    up = get_upscaler("TestGAN-tiny")
    x = jnp.ones((1, 3, 16, 16)) * 0.1
    out4 = up(x, 4.0)
    assert out4.shape == (1, 3, 64, 64)
    out2 = up(x, 2.0)                      # non-x4: model then lanczos down
    assert out2.shape == (1, 3, 32, 32)
