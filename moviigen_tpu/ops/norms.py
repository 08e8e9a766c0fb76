"""Normalization ops with the reference's mixed-precision discipline.

The reference keeps all norm statistics in fp32 even under bf16 autocast
(WanRMSNorm ``wan/modules/model.py:70-86``, WanLayerNorm ``model.py:89-99``,
T5LayerNorm ``wan/modules/t5.py:53-66``). We reproduce those dtype boundaries
explicitly: statistics in fp32, result cast back to the input dtype before
the (optional) affine parameters are applied.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
             eps: float = 1e-5) -> jnp.ndarray:
    """RMSNorm: x * rsqrt(mean(x^2) + eps) * weight.

    Statistics in fp32, normalized value cast back to ``x.dtype`` *before*
    the weight multiply — matching ref ``model.py:83``
    (``self._norm(x.float()).type_as(x) * self.weight``).
    """
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    normed = (xf * lax.rsqrt(var + eps)).astype(x.dtype)
    if weight is not None:
        # weight applied in x.dtype: under reference autocast the scale
        # IS half precision (model.py:83), and a fp32 weight here would
        # silently promote the whole [B, L, D] product back to fp32
        # (2.9 GB extra at 75k tokens)
        normed = normed * weight.astype(x.dtype)
    return normed


def t5_rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """T5-style RMSNorm (ref: t5.py:61-66): mean-square in fp32, then the
    normalized activation is cast to the *weight* dtype (half precision)
    before scaling."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    normed = x * lax.rsqrt(var + eps)  # promotes to fp32 (ref t5.py:62)
    if weight.dtype in (jnp.float16, jnp.bfloat16):
        normed = normed.astype(weight.dtype)
    return weight * normed


def layer_norm(x: jnp.ndarray, weight: Optional[jnp.ndarray] = None,
               bias: Optional[jnp.ndarray] = None, eps: float = 1e-6,
               keep_fp32: bool = False) -> jnp.ndarray:
    """LayerNorm computed in fp32 (ref WanLayerNorm model.py:94-99 does
    ``F.layer_norm(x.float()).type_as(x)``).

    If ``keep_fp32`` the fp32 result is returned without the downcast —
    used where the reference immediately continues in fp32 (e.g. AdaLN
    modulation sites, model.py:299).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    if not keep_fp32:
        normed = normed.astype(x.dtype)
    if weight is not None:
        normed = normed * weight
    if bias is not None:
        normed = normed + bias
    return normed
