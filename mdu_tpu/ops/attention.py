"""Attention primitives.

TPU restatement of the reference's VAE attention backends
(ref tile_utils/attn.py:19-183): the many VRAM-adaptive CUDA variants
(xformers / doggettx query-chunking / sdp / sub-quadratic) collapse into two
implementations here:

  * ``sdpa``            — one fused XLA softmax(QKᵀ)V with fp32 accumulation;
                          XLA already fuses this well on the MXU.
  * ``chunked_sdpa``    — serial query-block streaming, the blockwise
                          analogue of attn.py:95-147's query chunking, for
                          sequence lengths whose full score matrix would not
                          fit HBM.

A Pallas flash-attention kernel (mdu_tpu.ops.pallas.flash_attention) plugs in
behind the same signature for the hot path.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def sdpa(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v over [..., L, D] with fp32 softmax."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("...qd,...kd->...qk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", probs.astype(v.dtype), v)


def chunked_sdpa(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    q_chunk: int = 1024,
) -> jnp.ndarray:
    """Query-chunked attention — the score matrix is materialized for at most
    ``q_chunk`` query rows at a time (serial `lax.map` over chunks), bounding
    live memory at O(q_chunk · L) like ref attn.py:95-147."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    L, D = q.shape[-2], q.shape[-1]
    if L <= q_chunk:
        return sdpa(q, k, v, scale)
    pad = (-L) % q_chunk
    qp = jnp.pad(q, [(0, 0)] * (q.ndim - 2) + [(0, pad), (0, 0)])
    n_chunks = qp.shape[-2] // q_chunk
    qs = jnp.moveaxis(
        qp.reshape(*qp.shape[:-2], n_chunks, q_chunk, D), -3, 0)

    out = jax.lax.map(lambda qc: sdpa(qc, k, v, scale), qs)
    out = jnp.moveaxis(out, 0, -3)                   # [..., n_chunks, q_chunk, Dv]
    out = out.reshape(*out.shape[:-3], n_chunks * q_chunk, v.shape[-1])
    return out[..., :L, :]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


# flip the Pallas kernel on/off globally (e.g. for A/B benchmarking)
USE_FLASH_ATTENTION = True
FLASH_MIN_SEQ = 512


def _flash_variant(D: int):
    """Kernel layout choice, overridable via MDU_FLASH=lane|trans|fm|fm16.

    Measured on v5e (scripts/ab_bench.py --flash-t, 2026-08-16): the
    transposed layout wins or ties at every non-lane-aligned head dim —
    [16,8,9216,40] 43.1 vs 46.1 ms, [16,8,6144,64] 21.7 vs 23.3 ms,
    [16,8,2304,80] 7.20 vs 7.32 ms — and is far less block-sensitive.
    Lane-major stays for D % 128 == 0 (no pad either way).

    The fixed-max transposed kernel ``fm`` (one VPU pass per score block;
    denominator rides the PV matmul — pallas/flash_attention.py::
    _flash_kernel_t_fm) is the DEFAULT since the 2026-08-17 sweep: it beats
    the online-softmax layouts at every SD self-attention shape —
    [16,8,9216,40] 25.8 vs 44.7 ms (-42%), [16,8,6144,64] 14.7 vs 22.2
    (-34%), [16,8,2304,80] 5.4 vs 7.3 (-26%), ties at [16,8,576,160].
    ``fm16`` additionally runs the exp in bf16 (measured: no gain).
    """
    import functools
    import os

    from .pallas import (flash_attention, flash_attention_t,
                         flash_attention_t_fm)

    ov = os.environ.get("MDU_FLASH")
    if ov == "lane":
        return flash_attention
    if ov == "trans":
        return flash_attention_t
    if ov == "fm":
        return flash_attention_t_fm
    if ov == "fm16":
        return functools.partial(flash_attention_t_fm, bf16_exp=True)
    # lane-major keeps D%128==0 (VAE attention, D=512: no pad either way
    # and the fm Dv=+16 PV pad is unmeasured there)
    return flash_attention if D % 128 == 0 else flash_attention_t_fm


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    num_heads: int,
    q_chunk: Optional[int] = None,
) -> jnp.ndarray:
    """[B, L, H*D] qkv -> attention output [B, L, H*D].

    Dispatch: Pallas flash kernel on TPU for long sequences (the hot VAE /
    UNet self-attention path), full fused SDPA for short ones, serial
    query chunking as the bounded-memory fallback elsewhere.
    """
    B, Lq, HD = q.shape
    Lk = k.shape[1]
    D = HD // num_heads

    def split(x, L):
        return x.reshape(B, L, num_heads, D).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, Lq), split(k, Lk), split(v, Lk)
    if (USE_FLASH_ATTENTION and _on_tpu()
            and Lq >= FLASH_MIN_SEQ and Lk >= FLASH_MIN_SEQ):
        out = _flash_variant(D)(qh, kh, vh)
    elif q_chunk is not None:
        out = chunked_sdpa(qh, kh, vh, q_chunk=q_chunk)
    else:
        out = sdpa(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Lq, HD)
