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
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _local_attention_with_stats(q, k, v, k_lens, scale, backend,
                                compute_dtype):
    """(out, m, l) for a local shard; m/l: [B, Lq, N] fp32."""
    if backend == "pallas":
        from ..ops.flash_attention import flash_attention_with_stats

        return flash_attention_with_stats(q, k, v, k_lens=k_lens,
                                          scale=scale)
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
    for the padded tail of the sequence).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if attn_backend == "auto":
        attn_backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    my_idx = jax.lax.axis_index(axis_name)
    shard = k.shape[1]
    b = q.shape[0]

    q = (q * jnp.asarray(1.0, q.dtype)).astype(compute_dtype)
    k_blk = k.astype(compute_dtype)
    v_blk = v.astype(compute_dtype)

    m_acc = jnp.full((b, q.shape[1], q.shape[2]), -1e30, jnp.float32)
    l_acc = jnp.zeros_like(m_acc)
    o_acc = jnp.zeros((*q.shape[:3], q.shape[3]), jnp.float32)

    assert sp_size is not None, "pass sp_size (the seq-axis size)"
    n_static = sp_size
    perm = [(i, (i + 1) % n_static) for i in range(n_static)]

    for step in range(n_static):
        src = (my_idx - step) % n_static      # origin rank of current blk
        if k_lens is not None:
            # global k_len → local window [src·shard, (src+1)·shard)
            local_klens = jnp.clip(k_lens - src * shard, 0, shard) \
                .astype(jnp.int32)
        else:
            local_klens = None
        o_p, m_p, l_p = _local_attention_with_stats(
            q, k_blk, v_blk, local_klens, scale, attn_backend,
            compute_dtype)

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

        if step < n_static - 1:
            k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
            v_blk = jax.lax.ppermute(v_blk, axis_name, perm)

    return o_acc.astype(compute_dtype)
