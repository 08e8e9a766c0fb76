"""Unified attention entry point.

Parity target: the reference's attention shim ``wan/modules/attention.py``
which routes to FlashAttention-3/2 varlen CUDA kernels with a torch-SDPA
fallback. Here the roles map to:

- ``backend='pallas'`` — fused Pallas TPU flash-attention kernel
  (ops/flash_attention.py), the production path;
- ``backend='xla'``    — a pure jnp reference implementation that XLA fuses
  reasonably well; also the numerics oracle for the kernel tests.

Semantics mirrored from the reference shim:
- inputs are ``[B, L, N, D]`` (batch, tokens, heads, head_dim);
- optional ``k_lens`` masks keys beyond each sequence's true length
  (varlen packing in the reference, attention.py:62-80 — here an additive
  mask / in-kernel predicate, same math);
- softmax scale defaults to ``1/sqrt(D)``;
- q/k/v are computed in half precision on the fast path
  (attention.py:52-60 coerces to half dtype) with fp32 softmax
  accumulation.

No causal masking — DiT self/cross attention is bidirectional.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _auto_backend() -> str:
    """Resolve backend='auto' once per process.

    CPU → 'xla' (Pallas-TPU kernels can't lower there; small shapes in
    tests fuse fine). Known TPU platforms — including the experimental
    'axon' plugin, which IS a TPU — → 'pallas'. Anything else (e.g. a GPU
    deployment) gets the O(L)-memory chunked path rather than either the
    Mosaic kernel (which can't lower) or the O(L²)-memory xla path
    (343 TB of logits at 32k tokens)."""
    platform = jax.default_backend()
    if platform == "cpu":
        return "xla"
    if platform in ("tpu", "axon"):
        return "pallas"
    # Unknown accelerator: probe whether the Mosaic TPU kernel lowers.
    try:
        from .flash_attention import flash_attention as _pallas_fa
        z = jnp.zeros((1, 8, 1, 128), jnp.bfloat16)
        jax.jit(_pallas_fa).lower(z, z, z).compile()
        return "pallas"
    except Exception:
        return "chunked"


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   k_lens: Optional[jnp.ndarray], scale: float) -> jnp.ndarray:
    logits = jnp.einsum(
        "blnd,bsnd->bnls", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if k_lens is not None:
        s = k.shape[1]
        key_idx = jnp.arange(s)[None, None, None, :]
        mask = key_idx < k_lens[:, None, None, None]
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bnls,bsnd->blnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def _block_penalty(jidx, bk, k_lens):
    """Additive key mask for one block: 0 where the key is real,
    -1e30 past ``k_lens`` — [B, 1, 1, bk] fp32. Kept ADDITIVE (folded
    into the logits) instead of a ``where`` on the [B,N,Lq,bk] scores:
    XLA CSE'd the broadcast boolean between the forward and backward
    scans and materialized ALL blocks' full-size pred masks
    ([nblocks,B,N,Lq,bk] — 28.6 GB at the 14B sp=8 training point)."""
    key_idx = jidx * bk + jnp.arange(bk)
    mask = key_idx[None, None, None, :] < k_lens[:, None, None, None]
    return jnp.where(mask, 0.0, jnp.float32(-1e30))


def _kv_padded(k, v, bk, nblocks):
    """Pad k/v on the key axis to a block multiple. Blocks are then
    ``dynamic_slice``d out per scan step rather than pre-stacked into a
    [nblocks, B, bk, N, D] copy — the stacked layout materialized a
    second full-sequence K and V (plus their transpose copies) in HBM
    per call, which dominated the sp=16 training-memory probe."""
    lk = k.shape[1]
    lk_p = nblocks * bk
    kp = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0), (0, 0)))
    return kp, vp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _chunked_attention_p(q, k, v, k_lens, scale, bk):
    out, _, _ = _chunked_fwd_scan(q, k, v, k_lens, scale, bk)
    return out


def _chunked_fwd_scan(q, k, v, k_lens, scale, bk):
    """Online-softmax forward over key blocks; returns
    (out, m, l) with m/l raw natural-domain row stats [B,N,Lq,1]."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    nblocks = -(-lk // bk)
    kp, vp = _kv_padded(k, v, bk, nblocks)
    qf = q.astype(jnp.float32)

    def body(carry, jidx):
        m_prev, l_prev, acc = carry
        kc = jax.lax.dynamic_slice_in_dim(kp, jidx * bk, bk, axis=1)
        vc = jax.lax.dynamic_slice_in_dim(vp, jidx * bk, bk, axis=1)
        s = jnp.einsum("blnd,bsnd->bnls", qf, kc.astype(jnp.float32))
        s = s * scale + _block_penalty(jidx, bk, k_lens)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_next)
        l_next = jnp.exp(m_prev - m_next) * l_prev \
            + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * jnp.exp(m_prev - m_next).transpose(0, 2, 1, 3) \
            + jnp.einsum("bnls,bsnd->blnd", p, vc.astype(jnp.float32))
        return (m_next, l_next, acc), None

    m0 = jnp.full((b, n, lq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, n, lq, 1), jnp.float32)
    acc0 = jnp.zeros((b, lq, n, d), jnp.float32)
    (m, l, acc), _ = jax.lax.scan(
        body, (m0, l0, acc0), jnp.arange(nblocks))
    l_safe = jnp.where(l == 0.0, 1.0, l)
    out = acc / l_safe.transpose(0, 2, 1, 3)
    return out.astype(v.dtype), m, l


def chunked_attention_with_stats(q, k, v, k_lens, scale, bk):
    """(out, m, l) for the chunked scan, with m/l as [B, Lq, N] fp32
    natural-log-domain row stats — the stats contract of
    ``ops.flash_attention.flash_attention_with_stats``, used by the
    ring-attention online-softmax merge (parallel/ring.py) on meshes
    where the Pallas kernel can't lower (CPU certs, GPU fallback)."""
    out, m, l = _chunked_fwd_scan(q, k, v, k_lens, scale, bk)
    return (out, m[..., 0].transpose(0, 2, 1),
            l[..., 0].transpose(0, 2, 1))


def _chunked_fwd_rule(q, k, v, k_lens, scale, bk):
    out, m, l = _chunked_fwd_scan(q, k, v, k_lens, scale, bk)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return out, (q, k, v, k_lens, out, m + jnp.log(l_safe))


def chunked_pair_bwd(q, k, v, k_lens, out, lse, dout, scale, bk):
    """(dq, dk, dv) fp32 for one (query, key/value-shard) pair given the
    GLOBAL row stats: a scan over key blocks recomputing normalized
    probabilities p = exp(s − lse), so peak memory stays O(B·N·Lq·bk).

    Because p uses the *global* lse and delta = Σ_d dout·out uses the
    *global* out, the flash backward decomposes exactly over KV shards —
    per-shard partials sum to the true gradient. This is both the
    chunked backend's own VJP (shard = full sequence) and the per-pair
    backward of the ring-attention custom VJP (parallel/ring.py), where
    plain autodiff through the rotation loop would instead stash every
    rotation's K/V carries (183 GB/chip at the 14B sp=16 probe)."""
    b, lq, n, d = q.shape
    lk = k.shape[1]
    nblocks = -(-lk // bk)
    lk_p = nblocks * bk
    kp, vp = _kv_padded(k, v, bk, nblocks)
    qf = q.astype(jnp.float32)
    doutf = dout.astype(jnp.float32)
    # delta_i = sum_d dout_i * out_i  (rowwise), [B,N,Lq,1]
    delta = jnp.sum(doutf * out.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1)[..., None]

    def body(carry, jidx):
        dq_acc, dk_buf, dv_buf = carry
        kcf = jax.lax.dynamic_slice_in_dim(
            kp, jidx * bk, bk, axis=1).astype(jnp.float32)
        vcf = jax.lax.dynamic_slice_in_dim(
            vp, jidx * bk, bk, axis=1).astype(jnp.float32)
        s = jnp.einsum("blnd,bsnd->bnls", qf, kcf) * scale \
            + _block_penalty(jidx, bk, k_lens)
        p = jnp.exp(s - lse)
        dp = jnp.einsum("blnd,bsnd->bnls", doutf, vcf)
        ds = p * (dp - delta)
        dq_acc = dq_acc + scale * jnp.einsum("bnls,bsnd->blnd", ds, kcf)
        dkc = scale * jnp.einsum("bnls,blnd->bsnd", ds, qf)
        dvc = jnp.einsum("bnls,blnd->bsnd", p, doutf)
        # in-place block writes into the carried buffers (aliased by
        # XLA in the scan) instead of stacked ys + transpose + reshape,
        # which materialized a second full-sequence dk and dv
        dk_buf = jax.lax.dynamic_update_slice_in_dim(
            dk_buf, dkc, jidx * bk, axis=1)
        dv_buf = jax.lax.dynamic_update_slice_in_dim(
            dv_buf, dvc, jidx * bk, axis=1)
        return (dq_acc, dk_buf, dv_buf), None

    zeros_kv = jnp.zeros((b, lk_p, n, d), jnp.float32)
    (dq, dkp, dvp), _ = jax.lax.scan(
        body, (jnp.zeros_like(qf), zeros_kv, zeros_kv),
        jnp.arange(nblocks))
    return dq, dkp[:, :lk], dvp[:, :lk]


def _chunked_bwd_rule(scale, bk, res, dout):
    """Flash-style backward (see ``chunked_pair_bwd``) — the shard here
    is the full key sequence, so one call yields the whole gradient."""
    q, k, v, k_lens, out, lse = res
    dq, dk, dv = chunked_pair_bwd(q, k, v, k_lens, out, lse, dout,
                                  scale, bk)
    import numpy as _np

    dk_lens = _np.zeros(k_lens.shape, dtype=jax.dtypes.float0)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dk_lens)


_chunked_attention_p.defvjp(_chunked_fwd_rule, _chunked_bwd_rule)


def _chunked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       k_lens: Optional[jnp.ndarray], scale: float,
                       block_k: Optional[int] = None) -> jnp.ndarray:
    """Memory-bounded online-softmax attention as a ``lax.scan`` over key
    blocks — used as the flash kernel's backward reference and as a
    no-Pallas fallback for long sequences. Peak memory O(B·N·Lq·block_k)
    instead of O(B·N·Lq·Lk) in BOTH directions: the backward is a custom
    VJP that rescans key blocks recomputing probabilities from the saved
    log-sum-exp (the standard flash backward), not autodiff through the
    forward scan.

    ``MOVIIGEN_CHUNKED_BLOCK_K`` overrides the 1024 default at trace
    time — the AOT memory probes (tools/mem_probe_sp.py) shrink it so
    the CPU-mesh buffer profile approximates the Pallas kernel's (whose
    logits live in VMEM tiles, not HBM)."""
    if block_k is None:
        import os

        block_k = int(os.environ.get("MOVIIGEN_CHUNKED_BLOCK_K", "1024"))
    lk = k.shape[1]
    bk = min(block_k, lk)
    if k_lens is None:
        k_lens = jnp.full((q.shape[0],), lk, jnp.int32)
    return _chunked_attention_p(q, k, v, k_lens, scale, bk)


@functools.partial(
    jax.jit, static_argnames=("scale", "backend", "compute_dtype"))
def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              k_lens: Optional[jnp.ndarray] = None,
              scale: Optional[float] = None,
              backend: str = "auto",
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Bidirectional multi-head attention over ``[B, L, N, D]`` tensors.

    Args:
        q: [B, Lq, N, D]; k/v: [B, Lk, N, D].
        k_lens: optional [B] int array of true key lengths; keys beyond are
            masked out (ref attention.py:45-50,69-80).
        scale: softmax scale; defaults to D**-0.5.
        backend: 'auto' | 'pallas' | 'xla'.
        compute_dtype: dtype q/k/v are coerced to before the kernel
            (ref attention.py:52-60).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    q = q.astype(compute_dtype)
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)

    if backend == "auto":
        backend = _auto_backend()

    if backend == "pallas":
        from .flash_attention import flash_attention as _pallas_fa
        return _pallas_fa(q, k, v, k_lens=k_lens, scale=scale)
    if backend == "chunked":
        return _chunked_attention(q, k, v, k_lens, scale)
    return _xla_attention(q, k, v, k_lens, scale)
