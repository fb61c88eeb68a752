"""bench.release_pipeline: the config-5 HBM lever (evict the SD1.5 stack
before the SDXL+ControlNet build — see bench.py and PARITY.md round-4).

Pins the contract the on-chip fix relies on: every param buffer is freed
even while Python references remain, the jit cache is dropped, and a
retry of the phase (second call) is a no-op.
"""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mdu_tpu.config import Method, SamplerConfig, TiledDiffusionConfig
from mdu_tpu.models import (AutoencoderKL, UNet2DCondition, random_params,
                            tiny_unet_config, tiny_vae_config)
from mdu_tpu.pipeline import DiffusionPipeline


def test_release_pipeline_frees_buffers_and_is_idempotent():
    import bench

    ucfg = tiny_unet_config()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(tiny_vae_config())
    up = random_params(unet, 0, jnp.zeros((1, 4, 16, 16)), jnp.zeros((1,)),
                       jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = random_params(vae, 1, jnp.zeros((1, 3, 64, 64)), jax.random.PRNGKey(0))
    pipe = DiffusionPipeline(unet, up, vae, vp)
    cond = {"crossattn": jax.random.normal(jax.random.PRNGKey(0), (1, 7, 16)) * 0.1}
    res = pipe.txt2img(cond, None, width=64, height=64,
                       sampler=SamplerConfig(steps=1), seed=0,
                       tiled_diffusion=TiledDiffusionConfig(
                           method=Method.MULTI_DIFF, tile_w=16, tile_h=16,
                           overlap=8, tile_bs=2),
                       decode=False)
    assert np.isfinite(np.asarray(res.latents)).all()
    assert pipe._jit_cache          # populated by the run

    leaves = jax.tree.leaves(up)
    freed = bench.release_pipeline(pipe)
    assert freed > 0
    assert all(l.is_deleted() for l in leaves)
    assert pipe.unet_params is None and pipe.vae_params is None
    assert pipe._jit_cache == {}
    # retry of the phase must be a safe no-op
    assert bench.release_pipeline(pipe) == 0
