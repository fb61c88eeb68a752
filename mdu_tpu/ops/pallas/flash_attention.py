"""Pallas TPU flash attention (forward, non-causal).

The TPU-native replacement for the reference's VRAM-adaptive attention
backends (ref tile_utils/attn.py:19-183): one online-softmax kernel whose
live memory is O(block^2) regardless of sequence length — the blockwise
generalization of attn.py:95-147's query chunking, running from VMEM with
fp32 accumulators on the MXU.

Grid: (batch*heads, q_blocks, kv_blocks); the kv axis is innermost, so the
running max / denominator / accumulator live in VMEM scratch across kv
steps (the canonical TPU flash-attention accumulation pattern).

Block sizes measured on v5e for the UNet level-0 self-attention shape
[16, 8, 6144, 64] bf16 (scripts/ab_bench.py --kernels, 2026-08-16):
  bq=256 bk=512  -> 30 TFLOP/s     bq=512 bk=512  -> 34 TFLOP/s
  bq=512 bk=1024 -> 54 TFLOP/s     bq=256 bk=2048 -> 51 TFLOP/s
Defaults use the measured best (512, 1024).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, kv_pad: int):
    """kv_pad: number of zero-padded kv rows.  Instead of masking scores
    (an iota+compare+where over EVERY score element — pure VPU overhead on
    every block), padded rows run as real scores of 0 and their exact total
    contribution kv_pad·exp(−m_final) is subtracted from the softmax
    denominator once at the end (their V rows are zero, so the accumulator
    is untouched)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                       # [bq, d]
    k = k_ref[0]                       # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [bq, bk]

    m_prev = m_ref[:]                  # [bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)             # [bq, bk]
    corr = jnp.exp(m_prev - m_new)     # [bq, 1]

    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:]
        if kv_pad:
            # Clamp: if every real score in a row is <= ~-80 after scaling,
            # exp underflows and the corrected denominator could reach 0
            # (inf/NaN out).  Never happens at SD logit scales, but a tiny
            # floor costs nothing and keeps the kernel total.
            l = jnp.maximum(l - kv_pad * jnp.exp(-m_ref[:]), 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_block(L: int, block: int) -> int:
    """Block size along a sequence axis.  A single slightly-oversized block
    beats two half-empty ones: for L=576 with block 512 the grid would pad
    to 1024 rows (78% waste); one 640-row block pads only to 640."""
    r = _round_up(L, 128)
    if r <= block or r <= (block * 3) // 2:
        return r
    return block


def _flash_kernel_t(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                    *, scale: float, kv_pad: int):
    """Transposed-layout body: blocks are [D, L] (D on sublanes, L on lanes).

    Rationale: SD UNet head dims are 40/80/160 — none a multiple of 128, so
    the lane-major kernel above pads D to 128/256 and the QKᵀ contraction
    does up to 3.2x the useful MXU work.  With D on the *sublane* axis the
    pad granularity is 16 (bf16), so the contraction length stays ~D:
      sᵀ[bk,bq] = Σ_d k[d,bk]·q[d,bq]   (K=Dp≈D instead of 128)
      accᵀ[D,bq] += v[d,bk]·p[bk,bq]    (same MXU cost as lane-major PV)
    Online softmax runs over the sublane (kv) axis of sᵀ.  Padded kv rows
    are handled by the closed-form denominator correction (see
    _flash_kernel) rather than per-element masking.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = q_ref[0]                      # [d, bq]
    kt = k_ref[0]                      # [d, bk]
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [bk, bq]

    m_prev = m_ref[:]                  # [1, bq]
    m_new = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
    p = jnp.exp(st - m_new)            # [bk, bq]
    corr = jnp.exp(m_prev - m_new)     # [1, bq]

    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=0, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        v_ref[0], p.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_ref[:]
        if kv_pad:
            # see _flash_kernel._finish: floor guards exp-underflow -> l==0
            l = jnp.maximum(l - kv_pad * jnp.exp(-m_ref[:]), 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _flash_kernel_t_fm(q_ref, k_ref, v_ref, o_ref, acc_ref,
                       *, scale: float, smax: float, d_row: int,
                       bf16_exp: bool, clamp: bool):
    """Fixed-max transposed-layout body: ONE VPU pass per score block.

    The online-softmax bodies above touch every score element ~5 times on
    the VPU (max-reduce, subtract, exp, sum-reduce, cast) — at SD shapes
    that VPU chain is the measured ~22 ms floor with the MXU half idle
    (docs/TUNING.md).  This body replaces the running max with a static
    shift ``smax`` (scores are clamped to it, so exp can never overflow)
    and rides the denominator on the PV matmul instead of a VPU sum-reduce:
    V carries an appended ones row, so acc's row ``d_row`` accumulates
    Σp on the MXU.  The ones row is written only at REAL kv positions,
    which makes kv-padding masking exact and free (pad columns multiply a
    zero row).  Remaining VPU work per block: the single fused
    subtract+exp+cast pass (plus an optional clamp, see below).

    Accuracy contract: softmax is shift-invariant, so results are exact
    (to fp rounding) for any true max logit up to smax + 88.7 (the f32
    exp overflow headroom; ~119 at the default smax=30 — unreachable for
    SD attention, whose scaled logits sit well inside ±30).  With
    ``clamp=True`` scores above smax are additionally min-clamped so even
    pathological logits cannot overflow, at the cost of one more VPU pass.
    Scores ~40 below the row max contribute < e^-40 and underflow
    harmlessly.
    """
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qt = q_ref[0]                      # [d, bq]
    kt = k_ref[0]                      # [d, bk]
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [bk, bq]
    # clamp=False skips the min pass: exp(s - smax) only overflows f32 at
    # s > smax + 88.7 (= ~119 for the default smax) — far beyond any real
    # logit — and scores above smax then stay EXACT instead of flattened
    sh = (jnp.minimum(st, smax) if clamp else st) - smax
    if bf16_exp:
        p = jnp.exp(sh.astype(jnp.bfloat16)).astype(v_ref.dtype)
    else:
        p = jnp.exp(sh).astype(v_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        v_ref[0], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _finish():
        l = jnp.maximum(acc_ref[d_row:d_row + 1, :], 1e-30)
        o_ref[0] = (acc_ref[:] / l).astype(o_ref.dtype)


def _fm_default_blocks(Lq: int, Lk: int) -> tuple:
    """Measured-best (block_q, block_k) for the fm kernel on v5e
    (/tmp fm_sweep, 2026-08-17; min-of-2 reps, bf16, B*H=128):
      L=9216 D=40: (1536,1024) 25.8 ms   (1024,1024) 26.6
      L=6144 D=64: (1024,2048) 14.7      (1024,1024) 15.4
      L=2304 D=80: (2048, 512)  5.4      (1024,1024)  6.8
    (1024,1024) is the safe default shape-independent pick."""
    if Lk >= 8192:
        return 1536, 1024
    if Lk >= 4096:
        return 1024, 2048
    if Lk >= 2048:
        return 2048, 512
    return 1024, 1024


@functools.partial(jax.jit, static_argnames=(
    "scale", "block_q", "block_k", "smax", "bf16_exp", "clamp", "interpret"))
def flash_attention_t_fm(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    smax: float = 30.0,
    bf16_exp: bool = False,
    clamp: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fixed-max flash attention, transposed [D, L] layout.

    See ``_flash_kernel_t_fm``: trades the online running max for a static
    shift so each kv block costs one VPU pass and two MXU ops; the
    softmax denominator is accumulated by the PV matmul via a ones row
    appended to V (exact kv-pad masking for free).  ``clamp=True`` adds a
    min(s, smax) pass that bounds exp for arbitrarily large logits; the
    default relies on the 88.7-wide f32 exp headroom above ``smax``.
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5
    dq, dk = _fm_default_blocks(Lq, Lk)

    bq = _pick_block(Lq, block_q or dq)
    bk = _pick_block(Lk, block_k or dk)
    Dp = _round_up(D, 16)
    Dv = _round_up(D + 1, 16)          # + denominator ones row
    Lqp = _round_up(Lq, bq)
    Lkp = _round_up(Lk, bk)

    def prep(x, Lp, Dpad):
        x = x.reshape(B * H, x.shape[2], D)
        x = jnp.pad(x, ((0, 0), (0, Lp - x.shape[1]), (0, Dpad - D)))
        return x.transpose(0, 2, 1)            # [BH, Dpad, Lp]

    qp, kp = prep(q, Lqp, Dp), prep(k, Lkp, Dp)
    vp = prep(v, Lkp, Dv)
    # ones at REAL kv positions only: pad columns then multiply a zero row,
    # so the denominator needs no closed-form pad correction at all
    ones = (jnp.arange(Lkp) < Lk).astype(vp.dtype)
    vp = vp.at[:, D, :].set(ones[None, :])

    grid = (B * H, Lqp // bq, Lkp // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_t_fm, scale=scale, smax=smax,
                          d_row=D, bf16_exp=bf16_exp, clamp=clamp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Dp, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, Dp, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, Dv, bk), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, Dv, bq), lambda b, qi, ki: (b, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((B * H, Dv, Lqp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Dv, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qp, kp, vp)
    return out.transpose(0, 2, 1)[:, :Lq, :D].reshape(B, H, Lq, D)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention_t(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention for [B, H, L, D] with a transposed [D, L] block layout.

    Preferred when D is far from a multiple of 128 (SD1.5 head dims
    40/80/160): the QKᵀ contraction length is padded only to a multiple of
    16 instead of 128.  Same online-softmax math as ``flash_attention``.
    """
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)
    Dp = _round_up(D, 16)
    Lqp = _round_up(Lq, bq)
    Lkp = _round_up(Lk, bk)

    def prep(x, Lp):
        x = x.reshape(B * H, x.shape[2], D)
        x = jnp.pad(x, ((0, 0), (0, Lp - x.shape[1]), (0, Dp - D)))
        return x.transpose(0, 2, 1)            # [BH, Dp, Lp]

    qp, kp, vp = prep(q, Lqp), prep(k, Lkp), prep(v, Lkp)

    grid = (B * H, Lqp // bq, Lkp // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_t, scale=scale, kv_pad=Lkp - Lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Dp, bq), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, Dp, bk), lambda b, qi, ki: (b, 0, ki)),
            pl.BlockSpec((1, Dp, bk), lambda b, qi, ki: (b, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, Dp, bq), lambda b, qi, ki: (b, 0, qi)),
        out_shape=jax.ShapeDtypeStruct((B * H, Dp, Lqp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((Dp, bq), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out.transpose(0, 2, 1)[:, :Lq, :D].reshape(B, H, Lq, D)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k", "interpret"))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q kᵀ scale) v for [B, H, L, D] inputs, O(block²) live memory."""
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    if scale is None:
        scale = D ** -0.5

    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)
    Dp = _round_up(D, 128)
    Lqp = _round_up(Lq, bq)
    Lkp = _round_up(Lk, bk)

    def prep(x, Lp):
        x = x.reshape(B * H, x.shape[2], D)
        return jnp.pad(x, ((0, 0), (0, Lp - x.shape[1]), (0, Dp - D)))

    qp, kp, vp = prep(q, Lqp), prep(k, Lkp), prep(v, Lkp)

    grid = (B * H, Lqp // bq, Lkp // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_pad=Lkp - Lk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, Dp), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, Dp), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, Dp), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, Lqp, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Lq, :D].reshape(B, H, Lq, D)
