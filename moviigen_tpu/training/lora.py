"""LoRA fine-tuning as a functional parameter-tree transform.

Parity: the reference's peft-based LoRA path (``finetune.py:364-374,
400-404, 494-506`` — ``--use_lora``, ``--lora_rank/--lora_alpha``,
``resume_lora_optimizer`` / ``save_lora_checkpoint``). Two forms, same
math ``W_eff = W + (alpha/rank) · A @ B``:

- ``merge_lora``: materialize the merged kernels (full-precision trees
  only; used for export and small models — the delta einsum builds a
  full ``[L, d_in, d_out]`` tensor per target).
- ``attach_lora``: insert ``lora_A`` / pre-scaled ``lora_B`` into the
  targeted linear leaves; the model's dense ops add the rank-r side
  path ``(x@A)@B`` after the base GEMM (``wan_model._lora_side``).
  Works on QUANTIZED frozen trees (int4/int8 leaves stay packed — the
  QLoRA form: 14B base = 8.3 GB int4 on one 16 GB chip) and never
  materializes a merged kernel. Only A/B receive gradients either way.

Works on the stacked-layer layout — each target leaf
``[L, d_in, d_out]`` gets ``A [L, d_in, r]``, ``B [L, r, d_out]``.
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
    """LoRA A/B trees keyed by the target linear's path joined with '/'.

    Accepts full-precision trees (``.../kernel`` leaves) and quantized
    ones (``.../q8`` int8 ``[L, d_in, d_out]`` or ``.../q4`` packed
    uint8 ``[L, d_in//2, d_out]`` — ops/quantization.py formats), so a
    QLoRA run can derive shapes straight from the packed frozen base."""
    lora: Dict[str, Dict[str, jnp.ndarray]] = {}
    keys = jax.random.split(key, 64)
    i = 0
    for path, leaf in _walk(params):
        joined = "/".join(path)
        if not joined.endswith(("/kernel", "/q8", "/q4")):
            continue
        base = joined[: joined.rfind("/")]
        if base not in targets:
            continue
        if joined.endswith("/q4"):
            l, half, dout = leaf.shape
            din = half * 2
        else:
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


def attach_lora(params: Dict[str, Any], lora: Dict[str, Any],
                alpha: float = 64.0, rank: int = 64) -> Dict[str, Any]:
    """params with ``lora_A``/``lora_B`` inserted into each targeted
    linear leaf (pure tree rebuild; cheap under jit).

    The base weights stay byte-identical — including int4/int8 packed
    leaves — and the model's dense ops add the rank-r side path
    ``out += (x @ lora_A) @ lora_B`` (``wan_model._lora_side``). The
    alpha/rank scale is folded into the inserted ``lora_B`` so
    gradients flow to the caller's unscaled A/B exactly as in the
    merged form."""
    scale = alpha / rank

    def rebuild(tree, path=()):
        if not isinstance(tree, dict):
            return tree
        joined = "/".join(path)
        if joined in lora and ("kernel" in tree or "q8" in tree
                               or "q4" in tree):
            out = dict(tree)
            out["lora_A"] = lora[joined]["A"]
            out["lora_B"] = lora[joined]["B"] * scale
            return out
        return {k: rebuild(v, path + (k,)) for k, v in tree.items()}

    return rebuild(params)
