"""LoRA fine-tuning as a functional parameter-tree transform.

Parity: the reference's peft-based LoRA path (``finetune.py:364-374,
400-404, 494-506`` — ``--use_lora``, ``--lora_rank/--lora_alpha``,
``resume_lora_optimizer`` / ``save_lora_checkpoint``). Instead of
wrapping modules, LoRA here is:

    merged_kernel = kernel + (alpha/rank) · A @ B

materialized per step inside the jitted loss (XLA fuses the rank-r
update; only A/B receive gradients). Works on the stacked-layer layout —
each target leaf ``[L, d_in, d_out]`` gets ``A [L, d_in, r]``,
``B [L, r, d_out]``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = (
    "blocks/self_attn/q", "blocks/self_attn/k",
    "blocks/self_attn/v", "blocks/self_attn/o",
    "blocks/cross_attn/q", "blocks/cross_attn/k",
    "blocks/cross_attn/v", "blocks/cross_attn/o",
)


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    else:
        yield path, tree


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def init_lora_params(key: jax.Array, params: Dict[str, Any], rank: int = 64,
                     targets: Sequence[str] = DEFAULT_TARGETS,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """LoRA A/B trees keyed by 'path/to/kernel' joined with '/'."""
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(key, 64)
    i = 0
    for path, leaf in _walk(params):
        joined = "/".join(path)
        if not joined.endswith("/kernel"):
            continue
        base = joined[: -len("/kernel")]
        if base not in targets:
            continue
        l, din, dout = leaf.shape
        lora[base] = {
            # peft-style init: A ~ N(0, 1/r)-ish (kaiming), B = 0
            "A": jax.random.normal(keys[i % 64], (l, din, rank), dtype)
            * (1.0 / rank),
            "B": jnp.zeros((l, rank, dout), dtype),
        }
        i += 1
    if not lora:
        raise ValueError(f"no LoRA targets matched: {targets}")
    return lora


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any],
               alpha: float = 64.0, rank: int = 64) -> Dict[str, Any]:
    """params with merged LoRA deltas (pure; cheap under jit)."""
    scale = alpha / rank

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        joined = "/".join(path)
        if joined.endswith("/kernel"):
            base = joined[: -len("/kernel")]
            if base in lora:
                a = lora[base]["A"]
                b = lora[base]["B"]
                delta = jnp.einsum("lir,lro->lio", a, b) * scale
                return tree + delta.astype(tree.dtype)
        return tree

    return rebuild(params)
