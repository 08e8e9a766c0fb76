"""Pallas int8×int8→int32 GEMM with fused dequant epilogue (W8A8).

Replaces ``lax.dot_general`` int8 for the DiT block linears when W8A8
mode is active. Two things the XLA path can't express:

1. the int32 accumulator lives in VMEM scratch and is rescaled to bf16
   *inside* the kernel — the [M, N] int32 product never round-trips HBM
   (at 75.6k tokens × 5120 that's a 1.5 GB write+read per linear saved);
2. the per-token activation scale and per-output-channel weight scale
   (plus bias) fuse into the same epilogue.

Parity target: the W8A8 runtime the reference doesn't have (beyond-
parity; the reference runs all linears bf16 via cuBLAS,
wan/modules/model.py). Numerics oracle: ``ops.quantization.int8_matmul``
(exact int32) + fp32 rescale — see tests/test_int8_gemm.py.

Measured (docs/performance.md "W8A8", v5e, 32768×5120×5120): bf16 XLA
121.8 TF/s; XLA int8 dot + rescale 172.8 TOP/s (1.42×); this kernel
156-172 TOP/s fused at the swept-best 1024³ blocks (118 at the old
256/512/512 defaults) with a 180.4 TOP/s GEMM-only ceiling (1.48×).
The MXU's nominal double-rate int8 (394 TOPS) is not reachable on this
stack from either path — int8 achievable efficiency caps at ~46% of
spec vs 62% for bf16. XLA's int8 dot ties the Pallas kernel within
relay noise, so the serving path (`ops.quantization.int8_matmul`) stays
on XLA; this kernel remains for fusion-sensitive shapes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, preferred: int, multiple: int) -> Optional[int]:
    """Largest divisor of ``dim`` that is ≤ preferred and a multiple of
    ``multiple`` (None if dim itself isn't a multiple)."""
    if dim % multiple:
        return None
    b = min(preferred, dim)
    b -= b % multiple
    while b >= multiple:
        if dim % b == 0:
            return b
        b -= multiple
    return None


def _kernel(xq_ref, wq_ref, sx_ref, sw_ref, bias_ref, o_ref, acc_ref,
            *, nk: int, out_dtype):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], wq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _epilogue():
        out = acc_ref[:].astype(jnp.float32)
        out = out * sx_ref[:] * sw_ref[:]          # [bm,1] × [1,bn]
        if bias_ref is not None:
            out = out + bias_ref[:]
        o_ref[:] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk"))
def int8_gemm_fused(xq: jnp.ndarray, wq: jnp.ndarray, sx: jnp.ndarray,
                    sw: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                    out_dtype=jnp.bfloat16,
                    bm: int = 1024, bn: int = 1024, bk: int = 1024
                    ) -> jnp.ndarray:
    """``(xq·sx) @ (wq·sw) + bias`` with int8 inputs and a fused fp32
    rescale epilogue.

    Args:
        xq: [M, K] int8 (per-token quantized activations).
        wq: [K, N] int8 (per-out-channel quantized weights).
        sx: [M, 1] fp32 per-token scales.
        sw: [N] fp32 per-out-channel scales.
        bias: optional [N] (any float dtype).
        out_dtype: output dtype (bf16 default).
    Returns [M, N] ``out_dtype``.
    """
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (xq.shape, wq.shape)

    bm_ = _pick_block(m, bm, 32)
    bn_ = _pick_block(n, bn, 128)
    bk_ = _pick_block(k, bk, 128)
    if bm_ is None or bn_ is None or bk_ is None:
        # untileable shape (tiny test configs) → exact XLA fallback
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * sx * sw[None, :]
        if bias is not None:
            out = out + bias.astype(jnp.float32)[None, :]
        return out.astype(out_dtype)

    nm, nn, nk = m // bm_, n // bn_, k // bk_
    sw2 = sw.reshape(1, n).astype(jnp.float32)
    sx2 = sx.reshape(m, 1).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((bm_, bk_), lambda i, j, s: (i, s)),
        pl.BlockSpec((bk_, bn_), lambda i, j, s: (s, j)),
        pl.BlockSpec((bm_, 1), lambda i, j, s: (i, 0)),
        pl.BlockSpec((1, bn_), lambda i, j, s: (0, j)),
    ]
    args = [xq, wq, sx2, sw2]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn_), lambda i, j, s: (0, j)))
        args.append(bias.reshape(1, n).astype(jnp.float32))
        kern = functools.partial(_kernel, nk=nk, out_dtype=out_dtype)
    else:
        def kern(xr, wr, sxr, swr, o_ref, acc_ref):
            _kernel(xr, wr, sxr, swr, None, o_ref, acc_ref,
                    nk=nk, out_dtype=out_dtype)

    return pl.pallas_call(
        kern,
        grid=(nm, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        # interpret mode on CPU so the same code path is testable there
        interpret=jax.default_backend() == "cpu",
    )(*args)


def w8a8_linear(x: jnp.ndarray, q8: jnp.ndarray, scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in W8A8 linear over [..., K] activations: per-token dynamic
    int8 activation quant (ops.quantization.quantize_activations) + the
    fused Pallas GEMM."""
    from .quantization import quantize_activations

    *lead, k = x.shape
    xq, sx = quantize_activations(x)
    out = int8_gemm_fused(
        xq.reshape(-1, k), q8, sx.reshape(-1, 1), scale, bias,
        out_dtype=out_dtype)
    return out.reshape(*lead, q8.shape[-1])
