"""Pallas TPU flash attention (non-causal, k-length masked).

The TPU-native replacement for the reference's FlashAttention-2/3 CUDA
varlen kernels (``wan/modules/attention.py:24-130``). DiT self/cross
attention is bidirectional; the only masking need is per-sequence key
lengths (padding), handled in-kernel with a block predicate — no varlen
packing required.

Kernel structure (standard TPU online-softmax flash):
- grid = (B·N, L/BQ, L_k/BK); the last (k-block) dimension is sequential
  on TPU, so running max / sum / output accumulators live in VMEM scratch
  across k-block iterations ("arbitrary" dimension semantics).
- q/k/v stream through VMEM in (BQ, D) / (BK, D) blocks from HBM.
- logits/accumulation in fp32 (MXU ``preferred_element_type``); inputs
  bf16.

The backward pass is fully fused Pallas (custom_vjp): the forward saves
per-row softmax residuals (m, l); separate dKV and dQ kernels recompute
the probabilities blockwise (guide §7 structure) — no O(L²) matrices in
HBM in either direction. ``ops/attention.py`` backend='chunked' remains
as a differentiable XLA oracle.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024

# Auto block selection (block_q/block_k = None), from the v5e sweep at
# the production token counts (docs/performance.md "Flash block sweep"):
# a block_k that exactly DIVIDES Lk compiles out the key-pad mask (see
# `masked` below) and, being larger than 1024, does more MXU work per
# VMEM accumulator round-trip — measured +10% at 131,040 tokens
# (bq=1248, bk=2016) and +2% at 75,600 (bq=1200, bk=2160) over the
# padded 1024x1024 default. The candidate lists are exactly the blocks
# measured to WIN on v5e: larger ones (2048+, 2080) fail to lower
# (scoped-VMEM overflow) and smaller divisors (1120, 1200 as bk) lose
# to the plain 1024 despite compiling the mask out.
_BK_CANDIDATES = (2160, 2016, 1440)
_BQ_CANDIDATES = (1248, 1200)


def _auto_blocks(lq: int, lk: int) -> tuple:
    """(block_q, block_k) for this shape: the first measured-good
    divisor of Lq/Lk from the candidate lists, else the 1024 defaults.
    All candidates are multiples of 16 (bf16 sublane tiling); divisor-
    of-L kills both the pad copies and the in-kernel mask predicate.

    ``MOVIIGEN_FLASH_BLOCKS=bq,bk`` overrides (ops escape hatch for
    bisecting kernel-shape issues on specific hardware revisions)."""
    import os

    env = os.environ.get("MOVIIGEN_FLASH_BLOCKS")
    if env:
        try:
            parts = [int(v) for v in env.split(",")]
        except ValueError:
            parts = []
        if len(parts) != 2 or any(p <= 0 or p % 16 for p in parts):
            raise ValueError(
                f"MOVIIGEN_FLASH_BLOCKS={env!r}: expected 'bq,bk' — two "
                "positive ints, each a multiple of 16 (sublane tiling)")
        return parts[0], parts[1]
    bk = next((c for c in _BK_CANDIDATES if lk % c == 0),
              DEFAULT_BLOCK_K)
    bq = next((c for c in _BQ_CANDIDATES if lq % c == 0), None)
    # VMEM bound: bq*bk past ~2.6M fp32 logits tiles fails to lower
    if bq is None or bq * bk > 2_600_000:
        bq = DEFAULT_BLOCK_Q
    return bq, bk


def _stats_safe_bq(bq: int) -> int:
    """The per-row softmax-stat outputs/inputs are tiled as (1, 1, bq)
    blocks over [B·N, 1, Lq], whose LAST dim must be divisible by 128
    (Mosaic lane tiling) — so the stats forward (ring attention) and
    the custom-vjp fwd/bwd clamp non-conforming auto/explicit bq back
    to the 1024 default. The plain inference forward keeps the faster
    divisor bq; under `jax.grad` the step is dominated by the backward
    anyway."""
    return bq if bq % 128 == 0 else DEFAULT_BLOCK_Q


def _vjp_safe_bk(bk: int) -> int:
    """The fused dKV backward holds more live tiles per (bq, bk) block
    than the forward (s, p, dp, ds plus two fp32 dk/dv accumulators) —
    bk past 1024 overflows the 16 MB scoped-VMEM stack (measured:
    bk=2160 needs 18.1 MB). Training steps therefore stay at the 1024
    default; the auto divisor-bk speedup is a forward-only win."""
    return min(bk, DEFAULT_BLOCK_K)


_NEG_INF = -1e30
LOG2E = 1.4426950408889634  # softmax in base 2: exp→exp2, fold log2(e) into the q prescale


def _flash_kernel_stats(klen_ref, q_ref, k_ref, v_ref,
                        o_ref, m_out_ref, l_out_ref,
                        m_scratch, l_scratch, acc_scratch,
                        *, block_k: int, masked: bool):
    """Variant that also writes per-row softmax stats (running max m and
    normalizer l) — residuals for ring-attention cross-shard combination
    and (future) backward."""
    _flash_kernel(klen_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  block_k=block_k, masked=masked)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == nk - 1)
    def _store_stats():
        m_out_ref[0, 0] = m_scratch[:, 0]
        l_out_ref[0, 0] = l_scratch[:, 0]


def _flash_kernel(klen_ref, q_ref, k_ref, v_ref, o_ref,
                  m_scratch, l_scratch, acc_scratch,
                  *, block_k: int, masked: bool):
    """q is pre-scaled by the softmax scale (saves a VPU pass per tile);
    ``masked=False`` compiles out the key-padding predicate entirely."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BQ, BK]

    if masked:
        # key-padding mask: global key index >= k_len → -inf
        klen = klen_ref[pl.program_id(0)]
        key_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(key_idx < klen, s, _NEG_INF)

    m_prev = m_scratch[:]          # [BQ, 1]
    l_prev = l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)

    p = jnp.exp2(s - m_next)       # [BQ, BK] fp32 (base-2 softmax)
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    alpha = jnp.exp2(m_prev - m_next)
    l_next = alpha * l_prev + l_cur

    acc = acc_scratch[:] * alpha
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scratch[:] = m_next
    l_scratch[:] = l_next
    acc_scratch[:] = acc

    @pl.when(j == nk - 1)
    def _finalize():
        # l is 0 only if every key was masked; guard the divide
        l = l_scratch[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / l).astype(o_ref.dtype)


def _flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               k_lens: Optional[jnp.ndarray], scale: float,
               block_q: int, block_k: int,
               return_stats: bool = False):
    """q: [B, Lq, N, D]; k/v: [B, Lk, N, D] → [B, Lq, N, D]
    (+ optional per-row (m, l) stats [B, Lq, N])."""
    b, lq, n, d = q.shape
    lk = k.shape[1]

    # → [B·N, L, D]; pre-scale q by softmax scale × log2(e) (base-2
    # softmax: exp2 on the VPU, one less multiply per tile)
    qf = (q * jnp.asarray(scale * LOG2E, q.dtype)).transpose(0, 2, 1, 3) \
        .reshape(b * n, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)

    bq = min(block_q, lq)
    bk = min(block_k, lk)
    # pad to block multiples (masked via k_lens for keys; query padding
    # rows compute garbage that is sliced off)
    lq_p = -(-lq // bq) * bq
    lk_p = -(-lk // bk) * bk
    if lq_p != lq:
        qf = jnp.pad(qf, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        kf = jnp.pad(kf, ((0, 0), (0, lk_p - lk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, lk_p - lk), (0, 0)))

    # masking needed only when a caller-supplied k_lens could be < lk or
    # the key axis was padded
    masked = k_lens is not None or lk_p != lk
    if k_lens is None:
        klens = jnp.full((b,), lk, jnp.int32)
    else:
        klens = k_lens.astype(jnp.int32)
    klens = jnp.repeat(klens, n)  # [B·N], whole array in SMEM

    grid = (b * n, lq_p // bq, lk_p // bk)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # klens [B·N] whole-array
        pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
        pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0)),
    ]
    scratch = [
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, 1), jnp.float32),
        pltpu.VMEM((bq, d), jnp.float32),
    ]
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    if not return_stats:
        kernel = functools.partial(_flash_kernel, block_k=bk, masked=masked)
        out = pl.pallas_call(
            kernel,
            grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, d),
                                   lambda h, i, j: (h, i, 0)),
            scratch_shapes=scratch,
            out_shape=jax.ShapeDtypeStruct((b * n, lq_p, d), q.dtype),
            compiler_params=cparams,
        )(klens, qf, kf, vf)
        return out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)

    kernel = functools.partial(_flash_kernel_stats, block_k=bk,
                               masked=masked)
    out, m, l = pl.pallas_call(
        kernel,
        grid=grid, in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda h, i, j: (h, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda h, i, j: (h, 0, i)),
        ),
        scratch_shapes=scratch,
        out_shape=(
            jax.ShapeDtypeStruct((b * n, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * n, 1, lq_p), jnp.float32),
            jax.ShapeDtypeStruct((b * n, 1, lq_p), jnp.float32),
        ),
        compiler_params=cparams,
    )(klens, qf, kf, vf)
    out = out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    m = m[:, 0, :lq].reshape(b, n, lq).transpose(0, 2, 1)
    l = l[:, 0, :lq].reshape(b, n, lq).transpose(0, 2, 1)
    return out, m, l


# --------------------------------------------------------------------------
# backward kernels (dKV + dQ; the guide's §7 structure)
# --------------------------------------------------------------------------


def _flash_bwd_dkv_kernel(klen_ref, q_ref, do_ref, k_ref, v_ref,
                          m_ref, l_ref, di_ref, dk_ref, dv_ref,
                          dk_scratch, dv_scratch,
                          *, block_q: int, masked: bool):
    """grid = (B·N, KV blocks, Q blocks); Q dim sequential, dk/dv
    accumulate in VMEM scratch. q is pre-scaled by the softmax scale."""
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    q = q_ref[0]      # [BQ, D]
    do = do_ref[0]    # [BQ, D]
    k = k_ref[0]      # [BK, D]
    v = v_ref[0]
    m = m_ref[0, 0]   # [BQ] row-max
    l = l_ref[0, 0]   # [BQ] normalizer
    di = di_ref[0, 0]  # [BQ] = sum(o · do)

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [BQ, BK]
    if masked:
        klen = klen_ref[pl.program_id(0)]
        key_idx = pl.program_id(1) * s.shape[1] + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(key_idx < klen, s, _NEG_INF)

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    p = jnp.exp2(s - m[:, None]) * l_inv[:, None]            # [BQ, BK]

    dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
        p, do.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [BK, D]

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [BQ, BK]
    ds = p * (dp - di[:, None])

    dk_scratch[:] = dk_scratch[:] + jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # [BK, D]

    @pl.when(qi == nq - 1)
    def _store():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(klen_ref, q_ref, do_ref, k_ref, v_ref,
                         m_ref, l_ref, di_ref, dq_ref, dq_scratch,
                         *, block_k: int, masked: bool):
    """grid = (B·N, Q blocks, KV blocks); KV dim sequential."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    q = q_ref[0]
    do = do_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    m = m_ref[0, 0]
    l = l_ref[0, 0]
    di = di_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if masked:
        klen = klen_ref[pl.program_id(0)]
        key_idx = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(key_idx < klen, s, _NEG_INF)

    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    p = jnp.exp2(s - m[:, None]) * l_inv[:, None]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - di[:, None])
    dq_scratch[:] = dq_scratch[:] + jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _store():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, k_lens, o, m, l, do, scale, block_q, block_k):
    """Pallas backward: returns (dq, dk, dv) in the input layout."""
    b, lq, n, d = q.shape
    lk = k.shape[1]

    qf = (q * jnp.asarray(scale * LOG2E, q.dtype)) \
        .transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    dof = do.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b * n, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, lk, d)
    # m/l arrive as [B, Lq, N] fp32 → [B·N, 1, Lq] (TPU block tiling)
    mf = m.transpose(0, 2, 1).reshape(b * n, 1, lq)
    lf = l.transpose(0, 2, 1).reshape(b * n, 1, lq)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                 axis=-1)  # [B, Lq, N]
    dif = di.transpose(0, 2, 1).reshape(b * n, 1, lq)

    bq = min(block_q, lq)
    bk = min(block_k, lk)
    lq_p = -(-lq // bq) * bq
    lk_p = -(-lk // bk) * bk
    if lq_p != lq:
        pad = ((0, 0), (0, lq_p - lq), (0, 0))
        qf = jnp.pad(qf, pad)
        dof = jnp.pad(dof, pad)
        # +BIG so exp(s − m) underflows to 0 for padded q rows (their
        # do is 0, but inf·0 = NaN would otherwise poison dk/dv)
        mf = jnp.pad(mf, ((0, 0), (0, 0), (0, lq_p - lq)),
                     constant_values=-_NEG_INF)
        lf = jnp.pad(lf, ((0, 0), (0, 0), (0, lq_p - lq)))
        dif = jnp.pad(dif, ((0, 0), (0, 0), (0, lq_p - lq)))
    if lk_p != lk:
        pad = ((0, 0), (0, lk_p - lk), (0, 0))
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)

    masked = k_lens is not None or lk_p != lk
    if k_lens is None:
        klens = jnp.full((b,), lk, jnp.int32)
    else:
        klens = k_lens.astype(jnp.int32)
    klens = jnp.repeat(klens, n)  # [B·N], whole array in SMEM

    klspec = pl.BlockSpec(memory_space=pltpu.SMEM)  # klens whole-array
    qspec = pl.BlockSpec((1, bq, d), lambda h, i, j: (h, j, 0))
    kspec = pl.BlockSpec((1, bk, d), lambda h, i, j: (h, i, 0))
    statq = pl.BlockSpec((1, 1, bq), lambda h, i, j: (h, 0, j))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=bq,
                          masked=masked),
        grid=(b * n, lk_p // bk, lq_p // bq),
        in_specs=[klspec, qspec, qspec, kspec, kspec, statq, statq, statq],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bk, d), lambda h, i, j: (h, i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct((b * n, lk_p, d), jnp.float32),
            jax.ShapeDtypeStruct((b * n, lk_p, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(klens, qf, dof, kf, vf, mf, lf, dif)

    qspec2 = pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0))
    kspec2 = pl.BlockSpec((1, bk, d), lambda h, i, j: (h, j, 0))
    statq2 = pl.BlockSpec((1, 1, bq), lambda h, i, j: (h, 0, i))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=bk,
                          masked=masked),
        grid=(b * n, lq_p // bq, lk_p // bk),
        in_specs=[klspec, qspec2, qspec2, kspec2, kspec2, statq2, statq2,
                  statq2],
        out_specs=pl.BlockSpec((1, bq, d),
                               lambda h, i, j: (h, i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b * n, lq_p, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(klens, qf, dof, kf, vf, mf, lf, dif)

    dq = dq[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    dq = dq * jnp.float32(scale)  # chain rule for the pre-scaled q
    dk = dk[:, :lk].reshape(b, n, lk, d).transpose(0, 2, 1, 3)
    dk = dk * jnp.float32(1.0 / LOG2E)  # remove the folded log2(e) from q
    dv = dv[:, :lk].reshape(b, n, lk, d).transpose(0, 2, 1, 3)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, k_lens, scale, block_q, block_k):
    return _flash_fwd(q, k, v, k_lens, scale, block_q, block_k)


def _flash_vjp_fwd(q, k, v, k_lens, scale, block_q, block_k):
    out, m, l = _flash_fwd(q, k, v, k_lens, scale,
                           _stats_safe_bq(block_q), _vjp_safe_bk(block_k),
                           return_stats=True)
    return out, (q, k, v, k_lens, out, m, l)


def _flash_vjp_bwd(scale, block_q, block_k, res, g):
    q, k, v, k_lens, o, m, l = res
    dq, dk, dv = _flash_bwd(q, k, v, k_lens, o, m, l, g, scale,
                            _stats_safe_bq(block_q), _vjp_safe_bk(block_k))
    return (dq, dk, dv, None)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    k_lens: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None) -> jnp.ndarray:
    """Fused non-causal attention. Inputs [B, L, N, D] (bf16 preferred).
    ``k_lens=None`` selects the unmasked fast path; ``block_q``/
    ``block_k=None`` picks shape-adapted blocks (see ``_auto_blocks``)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    abq, abk = _auto_blocks(q.shape[1], k.shape[1])
    return _flash(q, k, v, k_lens, scale, block_q or abq, block_k or abk)


def flash_attention_with_stats(q, k, v, k_lens=None, scale=None,
                               block_q: Optional[int] = None,
                               block_k: Optional[int] = None):
    """Forward + per-row softmax residuals: (out, m, l) with m/l shaped
    [B, Lq, N]. Used by ring attention to merge partial results across
    sequence shards (online-softmax combination)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    abq, abk = _auto_blocks(q.shape[1], k.shape[1])
    out, m, l = _flash_fwd(q, k, v, k_lens, scale,
                           _stats_safe_bq(block_q or abq),
                           block_k or abk, return_stats=True)
    # internal stats are base-2 (exp2 softmax); l is identical in both
    # domains, m converts by ln2
    return out, m * jnp.float32(1.0 / LOG2E), l
