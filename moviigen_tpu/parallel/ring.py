"""Ring attention: sequence-parallel attention with rotating KV shards.

Parity target: the reference's ``--ring_size`` path, executed inside
xfuser's ``xFuserLongContextAttention`` (yunchang ring-flash-attn CUDA
kernels + NCCL P2P; ``wan/distributed/xdit_context_parallel.py:185``,
``generate.py:102-106``).

TPU-native: inside ``shard_map`` over the ``seq`` axis, each rank keeps
its query shard and rotates its KV shard around the ring with
``jax.lax.ppermute`` (point-to-point over ICI), merging the per-shard
flash-attention partials with the online-softmax correction (the guide's
§16 pattern). Communication is O(L/sp·D) per step, overlapped with the
local attention compute by XLA's async collectives.

vs Ulysses: ring never materializes the full sequence on any chip
(Ulysses holds full-L K/V with N/sp heads), so it is the mode for
sequences whose per-chip KV exceeds memory — the 131k-token 1080p case —
at the cost of sp−1 rotations.

Training (jax.grad) is supported on both backends. The Pallas path is a
ring-level ``jax.custom_vjp``: the forward is the stats loop below; the
backward rotates (k, v, dk, dv) together around the ring and calls the
fused Pallas backward kernels (``ops/flash_attention._flash_bwd``) per
(q-shard, kv-shard) pair with the *global* softmax stats — the flash
backward decomposes exactly over KV blocks given global (m, l, Δ), so
per-pair partials sum to the true gradient (reference counterpart:
training SP must backprop, ``scripts/train/model/model_seq.py:231-256``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _chunk_bk(shard):
    import os

    return min(int(os.environ.get("MOVIIGEN_CHUNKED_BLOCK_K", "1024")),
               shard)


def _local_attention_with_stats(q, k, v, k_lens, scale, backend,
                                compute_dtype):
    """(out, m, l) for a local shard; m/l: [B, Lq, N] fp32."""
    if backend == "pallas":
        from ..ops.flash_attention import flash_attention_with_stats

        return flash_attention_with_stats(q, k, v, k_lens=k_lens,
                                          scale=scale)
    if backend == "chunked":
        from ..ops.attention import chunked_attention_with_stats

        shard = k.shape[1]
        if k_lens is None:
            k_lens = jnp.full((q.shape[0],), shard, jnp.int32)
        return chunked_attention_with_stats(q, k, v, k_lens, scale,
                                            _chunk_bk(shard))
    # jnp fallback (tests / CPU mesh)
    logits = jnp.einsum("blnd,bsnd->bnls", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    if k_lens is not None:
        key_idx = jnp.arange(k.shape[1])[None, None, None, :]
        mask = key_idx < k_lens[:, None, None, None]
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=-1)                       # [B, N, Lq]
    p = jnp.exp(logits - m[..., None])
    l = jnp.sum(p, axis=-1)                            # [B, N, Lq]
    out = jnp.einsum("bnls,bsnd->blnd", p, v.astype(jnp.float32))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = out / l_safe.transpose(0, 2, 1)[..., None]
    return (out.astype(v.dtype), m.transpose(0, 2, 1),
            l.transpose(0, 2, 1))


def _local_klens(k_lens, src, shard):
    """Global per-batch key length → valid length inside the shard that
    originated on rank ``src`` (local window [src·shard, (src+1)·shard))."""
    if k_lens is None:
        return None
    return jnp.clip(k_lens - src * shard, 0, shard).astype(jnp.int32)


def _ring_fwd_loop(q, k, v, k_lens, axis_name, sp_size, scale, backend,
                   compute_dtype):
    """The rotating-KV forward; returns (o fp32, m, l) with global
    (natural-log domain) softmax stats for the local query shard."""
    my_idx = jax.lax.axis_index(axis_name)
    shard = k.shape[1]
    b = q.shape[0]

    k_blk = k
    v_blk = v
    m_acc = jnp.full((b, q.shape[1], q.shape[2]), -1e30, jnp.float32)
    l_acc = jnp.zeros_like(m_acc)
    o_acc = jnp.zeros((*q.shape[:3], q.shape[3]), jnp.float32)

    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    for step in range(sp_size):
        src = (my_idx - step) % sp_size       # origin rank of current blk
        o_p, m_p, l_p = _local_attention_with_stats(
            q, k_blk, v_blk, _local_klens(k_lens, src, shard), scale,
            backend, compute_dtype)

        # online-softmax merge of the partial (o_p normalized by l_p)
        m_new = jnp.maximum(m_acc, m_p)
        a_old = jnp.exp(m_acc - m_new)
        a_new = jnp.exp(m_p - m_new)
        o_acc = o_acc * (l_acc * a_old)[..., None] \
            + o_p.astype(jnp.float32) * (l_p * a_new)[..., None]
        l_acc = l_acc * a_old + l_p * a_new
        l_safe = jnp.where(l_acc == 0.0, 1.0, l_acc)
        o_acc = o_acc / l_safe[..., None]
        m_acc = m_new

        if step < sp_size - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return o_acc, m_acc, l_acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _ring_flash(q, k, v, k_lens, axis_name, sp_size, scale, backend):
    o, _, _ = _ring_fwd_loop(q, k, v, k_lens, axis_name, sp_size, scale,
                             backend, q.dtype)
    return o.astype(q.dtype)


def _ring_flash_fwd(q, k, v, k_lens, axis_name, sp_size, scale, backend):
    o, m, l = _ring_fwd_loop(q, k, v, k_lens, axis_name, sp_size, scale,
                             backend, q.dtype)
    return o.astype(q.dtype), (q, k, v, k_lens, o, m, l)


def _ring_flash_bwd(axis_name, sp_size, scale, backend, res, g):
    """Ring backward: rotate (k, v, dk, dv) together; each step the local
    q contributes to the currently-held shard's dk/dv via a flash-style
    per-pair backward with GLOBAL (m, l) — after sp rotations every dk/dv
    accumulator is back on its home rank. dq accumulates locally.

    Rotated K/V shards are REMATERIALIZED here by re-running the
    ppermute ring, never saved: only the home shard + (o, m, l) are
    residuals, so training memory stays O(L/sp) per chip. (Plain
    autodiff through the rotation loop instead stashes every rotation's
    K/V and logits — a ring=2×seq=8 probe of that form measured
    183 GB/chip.) backend='pallas' pairs use the fused Mosaic kernel;
    'chunked' (CPU-mesh certs / no-Pallas platforms) uses the scanned
    flash backward ``ops.attention.chunked_pair_bwd`` — both decompose
    exactly over KV shards given the global stats."""
    q, k, v, k_lens, o, m, l = res
    my_idx = jax.lax.axis_index(axis_name)
    shard = k.shape[1]
    b = q.shape[0]

    if backend == "pallas":
        from ..ops.flash_attention import (DEFAULT_BLOCK_K,
                                           DEFAULT_BLOCK_Q, LOG2E,
                                           _flash_bwd)

        # _flash_bwd consumes base-2-domain row maxima (its logits carry
        # the folded log2(e)); the fwd loop merged in the natural domain
        m2 = m * jnp.float32(LOG2E)
        oh = o.astype(q.dtype)
        do = g.astype(q.dtype)

        def pair_bwd(k_blk, v_blk, src):
            return _flash_bwd(
                q, k_blk, v_blk, _local_klens(k_lens, src, shard),
                oh, m2, l, do, scale, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    else:
        from ..ops.attention import chunked_pair_bwd

        l_safe = jnp.where(l == 0.0, 1.0, l)
        # chunked_pair_bwd's stats contract: lse [B,N,Lq,1], out [B,Lq,N,D]
        lse = (m + jnp.log(l_safe)).transpose(0, 2, 1)[..., None]
        of = o.astype(jnp.float32)
        dof = g.astype(jnp.float32)
        bk = _chunk_bk(shard)

        def pair_bwd(k_blk, v_blk, src):
            kl = _local_klens(k_lens, src, shard)
            if kl is None:
                kl = jnp.full((b,), shard, jnp.int32)
            return chunked_pair_bwd(q, k_blk, v_blk, kl, of, lse, dof,
                                    scale, bk)

    dq_acc = jnp.zeros(q.shape, jnp.float32)
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    k_blk, v_blk = k, v
    perm = [(i, (i + 1) % sp_size) for i in range(sp_size)]

    for step in range(sp_size):
        src = (my_idx - step) % sp_size
        dq_p, dk_p, dv_p = pair_bwd(k_blk, v_blk, src)
        dq_acc = dq_acc + dq_p.astype(jnp.float32)
        dk_acc = dk_acc + dk_p.astype(jnp.float32)
        dv_acc = dv_acc + dv_p.astype(jnp.float32)
        # rotate the accumulators WITH their kv shard; the final rotation
        # (kv no longer needed) brings every dk/dv home
        dk_acc = jax.lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = jax.lax.ppermute(dv_acc, axis_name, perm)
        if step < sp_size - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return (dq_acc.astype(q.dtype), dk_acc.astype(k.dtype),
            dv_acc.astype(v.dtype), None)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        k_lens: Optional[jnp.ndarray],
                        axis_name: str = "seq",
                        sp_size: Optional[int] = None,
                        scale: Optional[float] = None,
                        attn_backend: str = "auto",
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """q/k/v: [B, L/sp, N, D] sharded over ``axis_name``; returns the
    attention output for the local query shard against the full sequence.

    ``k_lens`` is the *global* key length per batch element (padding mask
    for the padded tail of the sequence). Differentiable on all backends:
    'pallas' and 'chunked' go through the ring-level custom_vjp above
    (O(L/sp)-memory backward rematerializing rotated K/V); 'xla' stays
    plain autodiff through the rotation loop — the independent gradient
    oracle for the custom-VJP tests (tests/test_ring_grad.py).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if attn_backend == "auto":
        attn_backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert sp_size is not None, "pass sp_size (the seq-axis size)"

    q = q.astype(compute_dtype)
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)

    if attn_backend in ("pallas", "chunked"):
        return _ring_flash(q, k, v, k_lens, axis_name, sp_size, scale,
                           attn_backend)

    o, _, _ = _ring_fwd_loop(q, k, v, k_lens, axis_name, sp_size, scale,
                             attn_backend, compute_dtype)
    return o.astype(compute_dtype)
