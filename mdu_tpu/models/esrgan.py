"""Flax RRDBNet (ESRGAN) — the GAN pre-upscaler family.

The reference delegates the img2img pre-upscale to A1111's GAN upscaler
registry (ref scripts/tilediffusion.py:281-304: "upscaling image with
{upscaler.name}").  This implements the standard ESRGAN x4 generator
(RRDBNet: residual-in-residual dense blocks) so real .safetensors ESRGAN
checkpoints plug into `mdu_tpu.upscale` alongside the resamplers.

Parameter naming matches new-arch ESRGAN (conv_first / body.N.rdbK.convJ /
conv_body / conv_up1 / conv_up2 / conv_hr / conv_last); the loader also
accepts old-arch ('model.0', 'model.1.sub.N.RDBK.convJ.0', ...) keys.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import Conv2D


@dataclass(frozen=True)
class RRDBNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    num_feat: int = 64
    num_blocks: int = 23
    grow: int = 32
    scale: int = 4


def tiny_rrdb_config() -> RRDBNetConfig:
    return RRDBNetConfig(num_feat=8, num_blocks=2, grow=4)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class ResidualDenseBlock(nn.Module):
    cfg: RRDBNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        nf, g = self.cfg.num_feat, self.cfg.grow
        self.conv1 = Conv2D(g, dtype=self.dtype)
        self.conv2 = Conv2D(g, dtype=self.dtype)
        self.conv3 = Conv2D(g, dtype=self.dtype)
        self.conv4 = Conv2D(g, dtype=self.dtype)
        self.conv5 = Conv2D(nf, dtype=self.dtype)

    def __call__(self, x):
        c1 = _lrelu(self.conv1(x))
        c2 = _lrelu(self.conv2(jnp.concatenate([x, c1], 1)))
        c3 = _lrelu(self.conv3(jnp.concatenate([x, c1, c2], 1)))
        c4 = _lrelu(self.conv4(jnp.concatenate([x, c1, c2, c3], 1)))
        c5 = self.conv5(jnp.concatenate([x, c1, c2, c3, c4], 1))
        return x + 0.2 * c5


class RRDB(nn.Module):
    cfg: RRDBNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.rdb1 = ResidualDenseBlock(self.cfg, dtype=self.dtype)
        self.rdb2 = ResidualDenseBlock(self.cfg, dtype=self.dtype)
        self.rdb3 = ResidualDenseBlock(self.cfg, dtype=self.dtype)

    def __call__(self, x):
        h = self.rdb1(x)
        h = self.rdb2(h)
        h = self.rdb3(h)
        return x + 0.2 * h


class RRDBNet(nn.Module):
    cfg: RRDBNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.conv_first = Conv2D(cfg.num_feat, dtype=self.dtype)
        self.body = [RRDB(cfg, dtype=self.dtype, name=f"body_{i}")
                     for i in range(cfg.num_blocks)]
        self.conv_body = Conv2D(cfg.num_feat, dtype=self.dtype)
        self.conv_up1 = Conv2D(cfg.num_feat, dtype=self.dtype)
        self.conv_up2 = Conv2D(cfg.num_feat, dtype=self.dtype)
        self.conv_hr = Conv2D(cfg.num_feat, dtype=self.dtype)
        self.conv_last = Conv2D(cfg.out_channels, dtype=self.dtype)

    def __call__(self, x):
        """[B,3,H,W] in [0,1] -> [B,3,4H,4W] in [0,1] (x4 generator)."""
        feat = self.conv_first(x)
        h = feat
        for blk in self.body:
            h = blk(h)
        h = feat + self.conv_body(h)
        h = _lrelu(self.conv_up1(jnp.repeat(jnp.repeat(h, 2, 2), 2, 3)))
        h = _lrelu(self.conv_up2(jnp.repeat(jnp.repeat(h, 2, 2), 2, 3)))
        return self.conv_last(_lrelu(self.conv_hr(h)))


def translate_esrgan_name(name: str) -> str:
    """Our flat param path -> new-arch ESRGAN key."""
    parts = name.split("/")
    head = parts[0]
    if head.startswith("body_"):
        i = head.split("_")[1]
        rdb, conv, leaf = parts[1], parts[2], parts[3]
        return f"body.{i}.{rdb}.{conv}.{leaf}"
    return f"{head}." + parts[-1]


_OLD_ARCH = {
    "conv_first": "model.0",
    "conv_body": "model.1.sub.23",     # trunk conv index = num_blocks
    "conv_up1": "model.3",
    "conv_up2": "model.6",
    "conv_hr": "model.8",
    "conv_last": "model.10",
}


def load_esrgan(path: str, cfg: RRDBNetConfig = None, dtype=jnp.float32):
    """Load an ESRGAN x4 safetensors checkpoint -> (model, params).

    Accepts new-arch (conv_first/body.N...) and old-arch (model.0/
    model.1.sub.N...) key layouts.
    """
    from flax import traverse_util

    from .loader import load_safetensors

    state = load_safetensors(path)
    old_arch = any(k.startswith("model.0") for k in state)
    if cfg is None:
        # infer architecture from the checkpoint
        first = state.get("conv_first.weight", state.get("model.0.weight"))
        g_key = ("body.0.rdb1.conv1.weight" if not old_arch
                 else "model.1.sub.0.RDB1.conv1.0.weight")
        grow = int(np.asarray(state[g_key]).shape[0])
        nf = int(np.asarray(first).shape[0])
        if old_arch:
            idx = [int(k.split(".")[3]) for k in state
                   if k.startswith("model.1.sub.") and "RDB" in k]
        else:
            idx = [int(k.split(".")[1]) for k in state if k.startswith("body.")]
        cfg = RRDBNetConfig(num_feat=nf, num_blocks=max(idx) + 1, grow=grow)

    model = RRDBNet(cfg, dtype=dtype)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16))))
    flat = traverse_util.flatten_dict(shapes["params"], sep="/")
    out = {}
    for name, leaf in flat.items():
        key = translate_esrgan_name(name)
        if old_arch:
            head = name.split("/")[0]
            if head.startswith("body_"):
                i = head.split("_")[1]
                rdb = name.split("/")[1].upper().replace("RDB", "RDB")
                conv = name.split("/")[2]
                leaf_n = name.split("/")[3]
                key = f"model.1.sub.{i}.{rdb}.{conv}.0.{leaf_n}"
            else:
                trunk = dict(_OLD_ARCH)
                trunk["conv_body"] = f"model.1.sub.{cfg.num_blocks}"
                key = trunk[head] + "." + name.split("/")[-1]
        t = state.get(key)
        if t is None:
            raise KeyError(f"ESRGAN checkpoint missing {key}")
        out[name] = jnp.asarray(np.asarray(t, np.float32)).astype(leaf.dtype)
    params = {"params": traverse_util.unflatten_dict(out, sep="/")}
    return model, params


def register_esrgan_upscaler(name: str, path: str, cfg: RRDBNetConfig = None,
                             dtype=jnp.float32):
    """Load a checkpoint and register it in the upscaler registry so
    `TiledDiffusionConfig(upscaler=name)` uses it (ref GAN pre-upscale)."""
    from ..upscale import register_upscaler
    from ..ops.resize import resize_nchw

    model, params = load_esrgan(path, cfg, dtype=dtype)

    def fn(x, scale):
        img01 = (x + 1.0) * 0.5                       # [-1,1] -> [0,1]
        up = jax.jit(model.apply)(params, img01)
        up = up * 2.0 - 1.0
        H, W = x.shape[-2] * 4, x.shape[-1] * 4
        target = (int(x.shape[-2] * scale), int(x.shape[-1] * scale))
        if (H, W) != target:                          # non-x4 request: resample
            up = resize_nchw(up, target, "lanczos")
        return up

    register_upscaler(name, fn)
    return model, params
