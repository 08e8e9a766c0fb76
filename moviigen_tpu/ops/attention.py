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
        on_tpu = jax.default_backend() == "tpu"
        backend = "pallas" if on_tpu else "xla"

    if backend == "pallas":
        from .flash_attention import flash_attention as _pallas_fa
        return _pallas_fa(q, k, v, k_lens=k_lens, scale=scale)
    return _xla_attention(q, k, v, k_lens, scale)
