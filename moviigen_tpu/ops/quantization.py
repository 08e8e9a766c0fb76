"""Int8 weight-only quantization for the DiT linears.

Purpose: the 14B flagship needs 28 GB in bf16 — beyond a single 16 GB
chip. Per-output-channel int8 weights (absmax/127 scales) bring the
block weights to ~13 GB; kernels dequantize per layer inside the scan
(one [in, out] bf16 transient at a time). Embeddings, norms, modulation
and the head stay in their original dtypes (small, numerics-critical).

Quantized leaf format (recognized by ``wan_model._dense``):
    {"q8": int8 [..., in, out], "scale": f32 [..., out], "bias": ...}
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

# block-param kernels worth quantizing (the big matmuls)
_TARGET_SUFFIXES = (
    "self_attn/q", "self_attn/k", "self_attn/v", "self_attn/o",
    "cross_attn/q", "cross_attn/k", "cross_attn/v", "cross_attn/o",
    "cross_attn/k_img", "cross_attn/v_img",
    "ffn/fc1", "ffn/fc2",
)


def quantize_linear(kernel, use_numpy: bool = True):
    """[..., in, out] float → (int8 kernel, fp32 per-out-channel scale)."""
    xp = np if use_numpy else jnp
    k = np.asarray(kernel, np.float32) if use_numpy else kernel
    absmax = xp.max(xp.abs(k), axis=-2, keepdims=True)  # [..., 1, out]
    scale = absmax / 127.0
    scale = xp.where(scale == 0, 1.0, scale)
    q = xp.clip(xp.round(k / scale), -127, 127).astype(np.int8)
    return q, scale.squeeze(-2).astype(np.float32)


def quantize_wan_params(params: Dict[str, Any],
                        use_numpy: bool = True) -> Dict[str, Any]:
    """Quantize the block linears of a WanModel param tree (host-side by
    default so a 28 GB bf16 tree never needs device residence)."""

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            if "kernel" in tree and "/".join(path).endswith(
                    _TARGET_SUFFIXES):
                q, s = quantize_linear(tree["kernel"], use_numpy)
                out = {"q8": q, "scale": s}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        return tree

    def path_endswith(joined, suffixes):
        return any(joined.endswith(sfx) for sfx in suffixes)

    # str.endswith accepts a tuple — used above directly
    return rebuild(params)


def host_init_quantized_wan(seed: int, cfg) -> Dict[str, Any]:
    """Random int8-quantized 14B-scale params built entirely host-side
    (for single-chip benchmarking of the flagship shape without a 28 GB
    intermediate)."""
    import ml_dtypes

    rng = np.random.default_rng(seed)
    d, fd, L = cfg.dim, cfg.ffn_dim, cfg.num_layers
    bf16 = np.dtype(ml_dtypes.bfloat16)

    def q8(shape_in_out):
        return {
            "q8": rng.integers(-127, 128, size=(L, *shape_in_out),
                               dtype=np.int8),
            "scale": np.full((L, shape_in_out[-1]),
                             0.02 / np.sqrt(shape_in_out[0]), np.float32),
            "bias": np.zeros((L, shape_in_out[-1]), bf16),
        }

    def attn(img=False):
        p = {"q": q8((d, d)), "k": q8((d, d)), "v": q8((d, d)),
             "o": q8((d, d)),
             "norm_q": {"scale": np.ones((L, d), np.float32)},
             "norm_k": {"scale": np.ones((L, d), np.float32)}}
        if img:
            p["k_img"] = q8((d, d))
            p["v_img"] = q8((d, d))
            p["norm_k_img"] = {"scale": np.ones((L, d), np.float32)}
        return p

    import math

    patch_in = cfg.in_dim * int(np.prod(cfg.patch_size))

    def lin(cin, cout, dtype=bf16, std=0.02):
        return {
            "kernel": (rng.standard_normal((cin, cout), dtype=np.float32)
                       * std).astype(dtype),
            "bias": np.zeros((cout,), dtype),
        }

    blocks = {
        "self_attn": attn(),
        "cross_attn": attn(img=cfg.model_type == "i2v"),
        "ffn": {"fc1": q8((d, fd)), "fc2": q8((fd, d))},
        "modulation": (rng.standard_normal((L, 6, d), dtype=np.float32)
                       / math.sqrt(d)),
    }
    if cfg.cross_attn_norm:
        blocks["norm3"] = {"scale": np.ones((L, d), np.float32),
                           "bias": np.zeros((L, d), np.float32)}
    return {
        "patch_embedding": lin(patch_in, d),
        "text_embedding": {"fc1": lin(cfg.text_dim, d),
                           "fc2": lin(d, d)},
        "time_embedding": {
            "fc1": lin(cfg.freq_dim, d, np.dtype(np.float32)),
            "fc2": lin(d, d, np.dtype(np.float32))},
        "time_projection": {"fc": lin(d, 6 * d, np.dtype(np.float32))},
        "blocks": blocks,
        "head": {
            "head": lin(d, int(np.prod(cfg.patch_size)) * cfg.out_dim,
                        np.dtype(np.float32)),
            "modulation": (rng.standard_normal((2, d), dtype=np.float32)
                           / math.sqrt(d)),
        },
    }
