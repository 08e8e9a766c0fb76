"""3D rotary position embeddings for video DiT tokens.

Parity target: ``wan/modules/model.py:29-67`` (``rope_params`` /
``rope_apply``). The reference builds complex-polar frequency tables in
float64 and rotates q/k with a python loop over the batch. TPU-native
design differences:

- tables are precomputed **sin/cos** arrays in float32 (TPU has no fp64;
  the max absolute phase error at position 1024 for theta=10000 is
  ~1e-4 rad, far below bf16 activation noise — covered by a unit test);
- the rotation is a fully vectorized even/odd channel rotate, jittable,
  with no per-sample loop;
- for sequence-parallel shards, the caller slices the flat table by the
  shard's global token offset (replaces the reference's SP-aware
  ``pad_freqs``/rank slicing, ``wan/distributed/xdit_context_parallel.py:24-62``).

Channel layout matches the reference exactly: the head_dim ``d`` is split
into complex pair groups ``(c - 2*(c//3), c//3, c//3)`` with ``c = d//2``
for the (frame, height, width) axes (``model.py:44``, ctor split at
``model.py:473-478`` uses ``d - 4*(d//6) == 2*(c - 2*(c//3))`` for even d),
and pairs are interleaved (even channel = real, odd = imag), matching
``torch.view_as_complex`` on ``[..., c, 2]``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _axis_freqs(dim_pairs: int, theta: float = 10000.0,
                max_pos: int = 1024) -> np.ndarray:
    """Per-axis angular frequencies: outer(arange(max_pos), theta^(-2i/d)).

    ``dim_pairs`` counts complex pairs; the reference's ``rope_params``
    (model.py:29-36) passes the *real* dim and strides by 2 — equivalent.
    """
    inv = 1.0 / np.power(
        theta, np.arange(0, dim_pairs, dtype=np.float64) / dim_pairs)
    return np.outer(np.arange(max_pos, dtype=np.float64), inv)


def rope_pair_split(head_dim: int) -> Tuple[int, int, int]:
    """Complex-pair split (t, h, w) of a head. ref model.py:44."""
    c = head_dim // 2
    return (c - 2 * (c // 3), c // 3, c // 3)


@dataclasses.dataclass(frozen=True)
class RopeTables:
    """Flattened per-token rotation tables for an (F, H, W) token grid.

    cos/sin: [F*H*W, head_dim//2] float32.
    """

    cos: jnp.ndarray
    sin: jnp.ndarray

    @property
    def seq_len(self) -> int:
        return self.cos.shape[0]

    def slice(self, start: int, size: int) -> "RopeTables":
        """Shard view for sequence-parallel ranks (global token offset)."""
        return RopeTables(
            cos=jnp.asarray(self.cos)[start:start + size],
            sin=jnp.asarray(self.sin)[start:start + size],
        )


def rope_3d_freqs(grid: Tuple[int, int, int], head_dim: int,
                  theta: float = 10000.0, max_pos: int = 1024) -> RopeTables:
    """Build flattened [L, c] cos/sin tables for a (F, H, W) patch grid.

    Equivalent to the reference's per-sample ``freqs_i`` assembly
    (model.py:54-59): f-axis frequencies broadcast over (h, w), h-axis over
    (f, w), w-axis over (f, h), concatenated along the channel axis in
    (t, h, w) order, then flattened to [F*H*W, c].
    """
    f, h, w = grid
    ct, ch, cw = rope_pair_split(head_dim)

    ang_t = _axis_freqs(ct, theta, max_pos)[:f]  # [f, ct]
    ang_h = _axis_freqs(ch, theta, max_pos)[:h]  # [h, ch]
    ang_w = _axis_freqs(cw, theta, max_pos)[:w]  # [w, cw]

    ang = np.concatenate(
        [
            np.broadcast_to(ang_t[:, None, None, :], (f, h, w, ct)),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, ch)),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, cw)),
        ],
        axis=-1,
    ).reshape(f * h * w, ct + ch + cw)

    return RopeTables(
        cos=jnp.asarray(np.cos(ang), dtype=jnp.float32),
        sin=jnp.asarray(np.sin(ang), dtype=jnp.float32),
    )


def _pair_swap_matrix(d: int) -> np.ndarray:
    """[D, D] permutation swapping each interleaved pair (2i ↔ 2i+1)."""
    p = np.zeros((d, d), np.float32)
    idx = np.arange(d // 2)
    p[2 * idx + 1, 2 * idx] = 1.0
    p[2 * idx, 2 * idx + 1] = 1.0
    return p


def full_width_tables(tables: RopeTables, l: int, d: int):
    """Duplicated full-width [l, D] cos2/sin2 tables (the form
    ``rope_apply`` builds internally), extended with the identity
    rotation (cos=1, sin=0) for positions past the table — so a
    token-chunked caller can slice per-chunk rows and rotate with
    ``rope_rotate`` while keeping ``rope_apply``'s padded-sequence
    pass-through semantics."""
    lr = min(l, tables.seq_len)
    cos = tables.cos[:lr]
    sin = tables.sin[:lr]
    cos2 = jnp.repeat(cos, 2, axis=1)
    sin2 = jnp.stack([-sin, sin], axis=-1).reshape(lr, d)
    if lr < l:
        cos2 = jnp.concatenate(
            [cos2, jnp.ones((l - lr, d), jnp.float32)], axis=0)
        sin2 = jnp.concatenate(
            [sin2, jnp.zeros((l - lr, d), jnp.float32)], axis=0)
    return cos2, sin2


def rope_rotate(x: jnp.ndarray, cos2: jnp.ndarray,
                sin2: jnp.ndarray) -> jnp.ndarray:
    """Rotate [B, L, N, D] by precomputed full-width [L, D] tables —
    the chunk-sliceable core of ``rope_apply`` (identical arithmetic)."""
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    # Pair-swap in the INPUT dtype: the permutation rows have a single
    # 1, so the matmul moves values without arithmetic — bit-exact in
    # any dtype. Casting to fp32 after (in the fused elementwise) keeps
    # the rotation arithmetic identical while the materialized swap
    # buffer is half-width: 1.34 GB instead of 2.68 at 131k tokens/40
    # heads, at every whole-L rope site.
    p = jnp.asarray(_pair_swap_matrix(d)).astype(x.dtype)
    xs = jnp.matmul(x, p, precision=jax.lax.Precision.HIGHEST)
    return (xf * cos2[None, :, None, :]
            + xs.astype(jnp.float32) * sin2[None, :, None, :])


def rope_apply(x: jnp.ndarray, tables: RopeTables) -> jnp.ndarray:
    """Rotate interleaved channel pairs of ``x`` by the per-token tables.

    TPU-shaped formulation: instead of deinterleaving even/odd channels
    (cross-lane shuffles on the VPU — measured 2.3× slower), the rotation
    is ``x·C + (x @ P)·S`` where P is the pair-swap permutation (one tiny
    exact MXU matmul) and C/S are the cos/sin tables duplicated to full
    width (C[2i]=C[2i+1]=cos_i; S[2i]=−sin_i, S[2i+1]=+sin_i). Bit-exact
    vs the deinterleaved form: the permutation rows have a single 1, so
    no summation error, and the elementwise arithmetic is identical.

    Args:
        x: [B, L, N, D] query/key tensor (any float dtype).
        tables: cos/sin of shape [L', D//2] with L' >= positions covered;
            if L > L' (sequence padded beyond the token grid), the excess
            positions pass through unrotated — matching ref model.py:63
            (``torch.cat([x_i, x[i, seq_len:]])``).

    Returns:
        Rotated tensor in float32 (ref returns ``.float()``, model.py:67).
    """
    b, l, n, d = x.shape
    xf = x.astype(jnp.float32)

    lr = min(l, tables.seq_len)
    cos = tables.cos[:lr]  # [lr, D/2]
    sin = tables.sin[:lr]
    # duplicated full-width tables (cheap [lr, D] constants, folded by XLA)
    cos2 = jnp.repeat(cos, 2, axis=1)                       # [lr, D]
    sin2 = jnp.stack([-sin, sin], axis=-1).reshape(lr, d)   # [lr, D]

    # pair-swap in the input dtype (exact — single-1 permutation rows;
    # see rope_rotate): halves the materialized swap transient at long L
    p = jnp.asarray(_pair_swap_matrix(d)).astype(x.dtype)
    xs = jnp.matmul(x[:, :lr], p,
                    precision=jax.lax.Precision.HIGHEST)    # pair swap
    rot = xf[:, :lr] * cos2[None, :, None, :] \
        + xs.astype(jnp.float32) * sin2[None, :, None, :]
    if lr < l:
        rot = jnp.concatenate([rot, xf[:, lr:]], axis=1)
    return rot
