"""RoPE parity tests against a float64 complex oracle.

The oracle independently implements the published Wan 3D-RoPE scheme
(per-axis complex-polar tables, channel split (c-2(c//3), c//3, c//3),
interleaved real/imag pairs) in numpy float64 and checks our fp32
sin/cos-table implementation against it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moviigen_tpu.ops.rope import (
    RopeTables, rope_3d_freqs, rope_apply, rope_pair_split)


def _oracle_tables(grid, head_dim, theta=10000.0, max_pos=1024):
    """Complex float64 per-token rotation factors, reference semantics."""
    f, h, w = grid
    ct, ch, cw = rope_pair_split(head_dim)

    def axis_tab(dim_pairs, n):
        inv = 1.0 / np.power(theta, np.arange(dim_pairs) / dim_pairs)
        ang = np.outer(np.arange(n), inv)
        return np.exp(1j * ang)

    tf, th, tw = axis_tab(ct, f), axis_tab(ch, h), axis_tab(cw, w)
    full = np.concatenate([
        np.broadcast_to(tf[:, None, None, :], (f, h, w, ct)),
        np.broadcast_to(th[None, :, None, :], (f, h, w, ch)),
        np.broadcast_to(tw[None, None, :, :], (f, h, w, cw)),
    ], axis=-1)
    return full.reshape(f * h * w, ct + ch + cw)


def _oracle_apply(x, grid, head_dim):
    """x: [B, L, N, D] float64; rotate interleaved pairs with complex mult."""
    b, l, n, d = x.shape
    freqs = _oracle_tables(grid, head_dim)  # [L', c]
    lr = min(l, freqs.shape[0])
    xc = x[:, :lr].reshape(b, lr, n, d // 2, 2)
    xc = xc[..., 0] + 1j * xc[..., 1]
    rotated = xc * freqs[None, :lr, None, :]
    out = np.stack([rotated.real, rotated.imag], axis=-1).reshape(b, lr, n, d)
    return np.concatenate([out, x[:, lr:]], axis=1)


@pytest.mark.parametrize("grid,head_dim", [
    ((3, 4, 5), 24), ((2, 6, 8), 64), ((5, 4, 4), 128),
])
def test_rope_matches_complex_oracle(grid, head_dim):
    rng = np.random.default_rng(0)
    l = grid[0] * grid[1] * grid[2]
    x = rng.standard_normal((2, l, 3, head_dim))

    want = _oracle_apply(x, grid, head_dim)
    tables = rope_3d_freqs(grid, head_dim)
    got = np.asarray(rope_apply(jnp.asarray(x, jnp.float32), tables))

    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_rope_passthrough_beyond_grid():
    """Padded positions beyond the token grid pass through unrotated
    (ref model.py:63)."""
    grid, head_dim = (2, 2, 2), 8
    l_pad = 12  # grid has 8 tokens, 4 padded
    x = np.random.default_rng(1).standard_normal((1, l_pad, 2, head_dim))
    tables = rope_3d_freqs(grid, head_dim)
    got = np.asarray(rope_apply(jnp.asarray(x, jnp.float32), tables))
    np.testing.assert_allclose(got[:, 8:], x[:, 8:].astype(np.float32),
                               atol=1e-6)


def test_rope_fp32_error_at_max_position():
    """fp32 tables vs float64 oracle at position 1023 (SURVEY §7.3: the
    fp64→fp32 hard part) — error must be far below bf16 resolution (~1e-2)."""
    grid, head_dim = (2, 2, 1024), 128  # stress the w axis to max_pos
    # only w-axis large; build a 1-token probe at the last position
    ct, ch, cw = rope_pair_split(head_dim)
    tabs = rope_3d_freqs((1, 1, 1024), head_dim)
    x = np.ones((1, 1024, 1, head_dim))
    got = np.asarray(rope_apply(jnp.asarray(x, jnp.float32), tabs))
    want = _oracle_apply(x, (1, 1, 1024), head_dim)
    assert np.max(np.abs(got - want)) < 5e-3


def test_rope_shard_slice_equals_full():
    """Sequence-parallel shards slice the flat table by global offset —
    sliced application must equal the corresponding rows of the full one."""
    grid, head_dim = (4, 4, 6), 32
    l = 96
    x = np.random.default_rng(2).standard_normal((1, l, 2, head_dim))
    tables = rope_3d_freqs(grid, head_dim)
    full = np.asarray(rope_apply(jnp.asarray(x, jnp.float32), tables))

    shard = tables.slice(48, 48)
    part = np.asarray(
        rope_apply(jnp.asarray(x[:, 48:], jnp.float32), shard))
    np.testing.assert_allclose(part, full[:, 48:], atol=1e-6)
