"""Optimal-transport noise pairing for flow-matching training.

Parity target: ``scripts/train/util/math_util.py::cosine_optimal_transport``
(L8-29) as used by ``scripts/train/finetune.py::process_batch`` (L206-208):
each latent in the batch is paired with the noise row that minimises total
cosine distance (a batch linear assignment), i.e. ``noise = noise[col_ind]``.

The reference implementation is broken — it calls
``batch_linear_assignment`` from the commented-out ``torch_linear_assignment``
import (math_util.py:3-5, 26) and NameErrors if ``--compute_ot`` is enabled.
This module provides a working equivalent.

TPU-native design: the assignment is exact and stays on-device. Batch size
is static under jit, so for B ≤ ``BRUTE_FORCE_MAX`` (8 — the reference
trains batch 1/GPU, finetune.sh) the optimum is found by scoring all B!
permutations with one gather+reduce (a (B!, B) int table is ≤ 1.3 MB);
larger batches fall back to the O(n³) Hungarian method on the host via
``jax.pure_callback`` (scipy.optimize.linear_sum_assignment).
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

BRUTE_FORCE_MAX = 8


def cosine_cost(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Negative cosine similarity cost matrix ``C[i, j] = -x̂_i · ŷ_j``.

    Matches math_util.py:20-24 (normalise rows, ``C = -X̂ Ŷᵀ``). Computed
    in fp32 with HIGHEST precision: assignment decisions are made on
    differences that bf16-decayed matmuls can flip.
    """
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    y = y.reshape(y.shape[0], -1).astype(jnp.float32)
    xn = x / jnp.linalg.norm(x, axis=1, keepdims=True)
    yn = y / jnp.linalg.norm(y, axis=1, keepdims=True)
    return -jnp.matmul(xn, yn.T, precision=jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=None)
def _perm_table(n: int) -> np.ndarray:
    return np.array(list(itertools.permutations(range(n))), dtype=np.int32)


def linear_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact minimum-cost assignment: returns ``col_ind`` with row i
    matched to column ``col_ind[i]``. jit-safe for any static n."""
    n = cost.shape[0]
    if n <= BRUTE_FORCE_MAX:
        perms = jnp.asarray(_perm_table(n))  # (n!, n)
        # total[p] = Σ_i cost[i, perms[p, i]]
        totals = cost[jnp.arange(n)[None, :], perms].sum(axis=1)
        return perms[jnp.argmin(totals)]

    def _host(c):
        from scipy.optimize import linear_sum_assignment

        return linear_sum_assignment(np.asarray(c))[1].astype(np.int32)

    return jax.pure_callback(
        _host, jax.ShapeDtypeStruct((n,), jnp.int32), cost)


def cosine_optimal_transport(
        x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference-shaped API: ``(cost_matrix, col_ind)``; row i of ``x``
    pairs with row ``col_ind[i]`` of ``y`` (math_util.py:8-29)."""
    cost = cosine_cost(x, y)
    return cost, linear_assignment(cost)


def ot_pair_noise(latents: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Permute ``noise`` so each latent gets its OT-matched noise row —
    the ``noise = noise[indices[1]]`` step of finetune.py:206-208. The
    permutation preserves the noise marginal: the result is still an
    i.i.d. Gaussian batch, only the latent↔noise pairing changes."""
    if latents.shape[0] <= 1:
        return noise
    _, col = cosine_optimal_transport(latents, noise)
    return noise[col]
