"""Flash-attention kernel tests.

On CPU the Pallas kernel runs in interpreter mode (same program, Python
semantics); numerics are checked against the plain XLA softmax oracle.
On-TPU compiled behavior is exercised by bench.py and the pipeline.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moviigen_tpu.ops.attention import _chunked_attention, attention


def _rand_qkv(b, l, n, d, lk=None, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    lk = lk or l
    q = jnp.asarray(rng.standard_normal((b, l, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, lk, n, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, lk, n, d)), dtype)
    return q, k, v


# keep a reference to the original before monkeypatching
from jax.experimental import pallas as pl  # noqa: E402

_orig_pallas_call = pl.pallas_call


@pytest.mark.parametrize("shape", [
    (1, 128, 2, 32), (2, 300, 3, 64), (1, 1024, 1, 128),
])
def test_pallas_interpret_matches_xla(shape):
    b, l, n, d = shape
    q, k, v = _rand_qkv(b, l, n, d)
    want = attention(q, k, v, backend="xla", compute_dtype=jnp.float32)
    got = _interp_flash(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def _interp():
    """Context manager forcing Pallas interpreter mode (CPU)."""
    import functools
    from unittest import mock

    from moviigen_tpu.ops import flash_attention as fa

    return mock.patch.object(
        fa.pl, "pallas_call",
        functools.partial(_orig_pallas_call, interpret=True))


def _interp_flash(q, k, v, k_lens=None, **kw):
    """Run the Pallas kernel in interpreter mode (CPU)."""
    from moviigen_tpu.ops import flash_attention as fa

    with _interp():
        return fa.flash_attention(q, k, v, k_lens=k_lens, **kw)


def test_flash_klens_masking():
    q, k, v = _rand_qkv(2, 200, 2, 32, seed=1)
    k_lens = jnp.asarray([200, 77], jnp.int32)
    want = attention(q, k, v, k_lens=k_lens, backend="xla",
                     compute_dtype=jnp.float32)
    got = _interp_flash(q, k, v, k_lens=k_lens, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_grad_via_chunked_bwd():
    q, k, v = _rand_qkv(1, 96, 2, 16, seed=2)

    def loss_flash(q, k, v):
        return jnp.sum(_interp_flash(q, k, v, block_q=32, block_k=32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(
            attention(q, k, v, backend="xla",
                      compute_dtype=jnp.float32) ** 2)

    with _interp():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_chunked_matches_xla():
    q, k, v = _rand_qkv(2, 257, 2, 32, seed=3)
    k_lens = jnp.asarray([257, 100], jnp.int32)
    want = attention(q, k, v, k_lens=k_lens, backend="xla",
                     compute_dtype=jnp.float32)
    got = _chunked_attention(q, k, v, k_lens, scale=32 ** -0.5, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_chunked_differentiable():
    q, k, v = _rand_qkv(1, 64, 1, 16, seed=4)

    def f(q):
        return jnp.sum(_chunked_attention(q, k, v, None, 0.25, 32))

    g = jax.grad(f)(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_chunked_custom_bwd_matches_xla():
    """The chunked backend's custom VJP (rescan + LSE recompute) vs
    autodiff through the XLA oracle — incl. k_lens masking and a key
    length that is not a block multiple."""
    q, k, v = _rand_qkv(2, 90, 2, 32, lk=150, seed=7)
    k_lens = jnp.asarray([150, 61], jnp.int32)

    def loss_chunked(q, k, v):
        out = _chunked_attention(q, k, v, k_lens, 32 ** -0.5, 64)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out = attention(q, k, v, k_lens=k_lens, backend="xla",
                        compute_dtype=jnp.float32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_chunked = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_chunked, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4,
            err_msg=f"d{name} mismatch")


def test_flash_pallas_bwd_matches_xla():
    """The fused Pallas backward (dq/dk/dv kernels) vs autodiff through
    the XLA oracle."""
    q, k, v = _rand_qkv(2, 160, 2, 32, seed=5)
    k_lens = jnp.asarray([160, 90], jnp.int32)

    def loss_flash(q, k, v):
        out = _interp_flash(q, k, v, k_lens=k_lens, block_q=64, block_k=64)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        out = attention(q, k, v, k_lens=k_lens, backend="xla",
                        compute_dtype=jnp.float32)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    with _interp():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch")


def test_flash_pallas_bwd_uneven_blocks():
    """Padded q/k blocks in the backward (L not a block multiple)."""
    q, k, v = _rand_qkv(1, 100, 3, 16, seed=6)

    def loss_flash(q, k, v):
        return jnp.sum(_interp_flash(q, k, v, block_q=64, block_k=64) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention(q, k, v, backend="xla",
                                 compute_dtype=jnp.float32) ** 2)

    with _interp():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_auto_block_selection():
    """Auto blocks (docs/performance.md "Flash block sweep"): divisor
    blocks at the production token counts, 1024 defaults elsewhere, and
    the vjp/stats clamps that keep the backward inside scoped VMEM and
    the (1,1,bq) stat tiles lane-aligned."""
    from moviigen_tpu.ops.flash_attention import (
        DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, _auto_blocks, _stats_safe_bq,
        _vjp_safe_bk)

    # production winners (measured on v5e)
    assert _auto_blocks(75600, 75600) == (1200, 2160)
    assert _auto_blocks(131040, 131040) == (1248, 2016)
    # 32,760 has no multiple-of-16 divisor at all -> defaults
    assert _auto_blocks(32760, 32760) == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
    # cross-attention: 512 text keys -> bk stays default
    bq, bk = _auto_blocks(75600, 512)
    assert (bq, bk) == (1200, DEFAULT_BLOCK_K)
    # every candidate the picker can return is a divisor (mask-free)
    for lq, lk in [(75600, 75600), (131040, 131040), (75600, 512),
                   (4680, 4680), (2016, 2016)]:
        bq, bk = _auto_blocks(lq, lk)
        assert bk == DEFAULT_BLOCK_K or lk % bk == 0
        assert bq == DEFAULT_BLOCK_Q or lq % bq == 0
        assert bq % 16 == 0 and bk % 16 == 0

    # stats tiles need bq % 128 == 0; backward needs bk <= 1024
    assert _stats_safe_bq(1200) == DEFAULT_BLOCK_Q
    assert _stats_safe_bq(1024) == 1024
    assert _vjp_safe_bk(2160) == DEFAULT_BLOCK_K
    assert _vjp_safe_bk(512) == 512


def test_auto_blocks_env_override(monkeypatch):
    """MOVIIGEN_FLASH_BLOCKS=bq,bk overrides shape-adapted selection
    (ops escape hatch for hardware bisects)."""
    from moviigen_tpu.ops.flash_attention import _auto_blocks

    monkeypatch.delenv("MOVIIGEN_FLASH_BLOCKS", raising=False)
    assert _auto_blocks(131040, 131040) == (1248, 2016)
    monkeypatch.setenv("MOVIIGEN_FLASH_BLOCKS", "512,768")
    assert _auto_blocks(131040, 131040) == (512, 768)
    for bad in ("512", "0,768", "512,-16", "a,b", "512,1000"):
        monkeypatch.setenv("MOVIIGEN_FLASH_BLOCKS", bad)
        with pytest.raises(ValueError, match="MOVIIGEN_FLASH_BLOCKS"):
            _auto_blocks(131040, 131040)
