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

The backward pass uses a memory-bounded chunked XLA fallback
(``attention.py`` backend='chunked') until the Pallas bwd kernel lands;
the forward is wired with ``jax.custom_vjp`` accordingly.
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

_NEG_INF = -1e30


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
        m_out_ref[0] = m_scratch[:, 0][None, :]
        l_out_ref[0] = l_scratch[:, 0][None, :]


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

    p = jnp.exp(s - m_next)        # [BQ, BK] fp32
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    alpha = jnp.exp(m_prev - m_next)
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

    # → [B·N, L, D]; pre-scale q by the softmax scale
    qf = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3) \
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
    klens = jnp.repeat(klens, n)  # [B·N]

    grid = (b * n, lq_p // bq, lk_p // bk)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda h, i, j, *_: (h, i, 0)),
        pl.BlockSpec((1, bk, d), lambda h, i, j, *_: (h, j, 0)),
        pl.BlockSpec((1, bk, d), lambda h, i, j, *_: (h, j, 0)),
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
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
                out_specs=pl.BlockSpec((1, bq, d),
                                       lambda h, i, j, *_: (h, i, 0)),
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((b * n, lq_p, d), q.dtype),
            compiler_params=cparams,
        )(klens, qf, kf, vf)
        return out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)

    kernel = functools.partial(_flash_kernel_stats, block_k=bk,
                               masked=masked)
    out, m, l = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, bq, d), lambda h, i, j, *_: (h, i, 0)),
                pl.BlockSpec((1, bq), lambda h, i, j, *_: (h, i)),
                pl.BlockSpec((1, bq), lambda h, i, j, *_: (h, i)),
            ),
            scratch_shapes=scratch,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * n, lq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * n, lq_p), jnp.float32),
            jax.ShapeDtypeStruct((b * n, lq_p), jnp.float32),
        ),
        compiler_params=cparams,
    )(klens, qf, kf, vf)
    out = out[:, :lq].reshape(b, n, lq, d).transpose(0, 2, 1, 3)
    m = m[:, :lq].reshape(b, n, lq).transpose(0, 2, 1)
    l = l[:, :lq].reshape(b, n, lq).transpose(0, 2, 1)
    return out, m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash(q, k, v, k_lens, scale, block_q, block_k):
    return _flash_fwd(q, k, v, k_lens, scale, block_q, block_k)


def _flash_vjp_fwd(q, k, v, k_lens, scale, block_q, block_k):
    out = _flash_fwd(q, k, v, k_lens, scale, block_q, block_k)
    return out, (q, k, v, k_lens)


def _flash_vjp_bwd(scale, block_q, block_k, res, g):
    """Backward via the chunked differentiable reference (memory-bounded);
    a fused Pallas bwd kernel is the planned replacement."""
    from .attention import _chunked_attention

    q, k, v, k_lens = res

    def f(q, k, v):
        return _chunked_attention(q, k, v, k_lens, scale, block_k)

    _, vjp = jax.vjp(f, q, k, v)
    return (*vjp(g), None)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    k_lens: Optional[jnp.ndarray] = None,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """Fused non-causal attention. Inputs [B, L, N, D] (bf16 preferred).
    ``k_lens=None`` selects the unmasked fast path."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    return _flash(q, k, v, k_lens, scale, block_q, block_k)


def flash_attention_with_stats(q, k, v, k_lens=None, scale=None,
                               block_q: int = DEFAULT_BLOCK_Q,
                               block_k: int = DEFAULT_BLOCK_K):
    """Forward + per-row softmax residuals: (out, m, l) with m/l shaped
    [B, Lq, N]. Used by ring attention to merge partial results across
    sequence shards (online-softmax combination)."""
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    return _flash_fwd(q, k, v, k_lens, scale, block_q, block_k,
                      return_stats=True)
