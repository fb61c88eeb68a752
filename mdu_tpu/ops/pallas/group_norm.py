"""Pallas fused GroupNorm: stats + normalize in one VMEM-resident pass.

XLA lowers our GroupNorm (ops/groupnorm.py) to several HBM passes (fp32
convert, two reductions, normalize+affine); measured ~1.33 ms for a
[16,640,64,96] activation on v5e — ~30x the bandwidth roofline and a
visible slice of every UNet/VAE step (ROADMAP.md item 1).

This kernel tiles the batch x group grid; each program holds one group's
activations in VMEM, computes fp32 moments, and writes the normalized
affine output — one HBM read + one write total.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[0, 0].astype(jnp.float32)          # [C/G, HW]
    mean = jnp.mean(x)
    var = jnp.mean(jnp.square(x)) - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + eps)
    w = w_ref[0].astype(jnp.float32)             # [C/G, 1]
    b = b_ref[0].astype(jnp.float32)
    o_ref[0, 0] = (((x - mean) * rstd) * w + b).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "interpret"))
def fused_group_norm(
    x: jnp.ndarray,
    num_groups: int,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm over NCHW with per-(batch, group) fp32 stats, one fused pass.

    Each (b, g) block must fit VMEM: (C/G) * H * W * 4B — true for every SD
    UNet/VAE layer (<= ~1 MB).  Falls back to ops.groupnorm.group_norm via
    the caller when that bound is exceeded.
    """
    B, C, H, W = x.shape
    G = num_groups
    Cg = C // G
    xr = x.reshape(B, G, Cg, H * W)
    wr = weight.reshape(G, Cg, 1)
    br = bias.reshape(G, Cg, 1)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, eps=eps),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec((1, 1, Cg, H * W), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, Cg, 1), lambda b, g: (g, 0, 0)),
            pl.BlockSpec((1, Cg, 1), lambda b, g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Cg, H * W), lambda b, g: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        interpret=interpret,
    )(xr, wr, br)
    return out.reshape(B, C, H, W)
