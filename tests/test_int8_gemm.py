"""Pallas W8A8 GEMM (ops/int8_gemm.py) vs the exact int32 XLA oracle."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moviigen_tpu.ops.int8_gemm import int8_gemm_fused, w8a8_linear
from moviigen_tpu.ops.quantization import (int8_matmul,
                                           quantize_activations,
                                           quantize_linear)


def _oracle(xq, wq, sx, sw, bias=None):
    out = np.asarray(int8_matmul(jnp.asarray(xq), jnp.asarray(wq)),
                     np.float32) * sx * sw[None, :]
    if bias is not None:
        out = out + np.asarray(bias, np.float32)[None, :]
    return out


@pytest.mark.parametrize("m,k,n", [(256, 512, 640), (96, 256, 128),
                                   (512, 384, 512)])
@pytest.mark.parametrize("with_bias", [True, False])
def test_fused_gemm_matches_int32_oracle(m, k, n, with_bias):
    rng = np.random.default_rng(0)
    xq = rng.integers(-127, 128, (m, k), dtype=np.int8)
    wq = rng.integers(-127, 128, (k, n), dtype=np.int8)
    sx = rng.uniform(1e-3, 2e-2, (m, 1)).astype(np.float32)
    sw = rng.uniform(1e-3, 2e-2, (n,)).astype(np.float32)
    bias = rng.standard_normal(n).astype(np.float32) if with_bias else None

    got = np.asarray(int8_gemm_fused(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(sx),
        jnp.asarray(sw), None if bias is None else jnp.asarray(bias),
        out_dtype=jnp.float32))
    ref = _oracle(xq, wq, sx, sw, bias)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_untileable_shapes_fall_back_exactly():
    """Odd dims (tiny test configs) route to the XLA fallback and stay
    exact."""
    rng = np.random.default_rng(1)
    xq = rng.integers(-127, 128, (7, 48), dtype=np.int8)
    wq = rng.integers(-127, 128, (48, 20), dtype=np.int8)
    sx = rng.uniform(1e-3, 1e-2, (7, 1)).astype(np.float32)
    sw = rng.uniform(1e-3, 1e-2, (20,)).astype(np.float32)
    got = np.asarray(int8_gemm_fused(
        jnp.asarray(xq), jnp.asarray(wq), jnp.asarray(sx),
        jnp.asarray(sw), out_dtype=jnp.float32))
    np.testing.assert_allclose(got, _oracle(xq, wq, sx, sw),
                               rtol=1e-6, atol=1e-6)


def test_w8a8_linear_end_to_end():
    """Float-in/float-out linear (quantize_activations + fused GEMM)
    matches the existing XLA W8A8 path bit-for-bit in fp32."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 64, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 384)) * 0.02).astype(np.float32)
    bias = rng.standard_normal(384).astype(np.float32)
    q8, scale = quantize_linear(w)

    got = np.asarray(w8a8_linear(
        jnp.asarray(x), jnp.asarray(q8), jnp.asarray(scale),
        jnp.asarray(bias), out_dtype=jnp.float32))

    xq, sx = quantize_activations(jnp.asarray(x))
    ref = (np.asarray(int8_matmul(xq.reshape(-1, 256), jnp.asarray(q8)),
                      np.float32)
           * np.asarray(sx).reshape(-1, 1) * scale[None, :]
           + bias[None, :]).reshape(4, 64, 384)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)


def test_w8a8_quality_vs_float():
    """End-to-end quant error stays small relative to the float matmul
    (sanity that scales are applied on the right axes)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((128, 256)).astype(np.float32)
    w = (rng.standard_normal((256, 256)) * 0.05).astype(np.float32)
    q8, scale = quantize_linear(w)
    got = np.asarray(w8a8_linear(jnp.asarray(x), jnp.asarray(q8),
                                 jnp.asarray(scale),
                                 out_dtype=jnp.float32))
    ref = x @ w
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02, f"relative error {rel}"
