"""Int8 / int4 weight-only quantization for the DiT linears.

Purpose: the 14B flagship needs 28 GB in bf16 — beyond a single 16 GB
chip. Two levels:

- **int8** (per-output-channel absmax/127 scales): block weights
  ~14 GB — fits big-HBM parts, but on a 16 GB v5e leaves no activation
  headroom at 81-frame workloads.
- **int4** (grouped symmetric, default group=128 input channels, two
  nibbles packed per byte): block weights ~7.5 GB incl. scales — the
  14B flagship *runs whole on one 16 GB chip*, a workload the reference
  spreads over multiple GPUs with FSDP.

Kernels dequantize just-in-time per layer inside the block scan (one
[in, out] bf16 transient at a time). Embeddings, norms, modulation and
the head stay in their original dtypes (small, numerics-critical).

Quantized leaf formats (recognized by ``wan_model._dense`` via
``dequantize_leaf``):
    {"q8": int8 [..., in, out],        "scale": f32 [..., out],        "bias": ...}
    {"q4": uint8 [..., in//2, out],    "scale": f32 [..., in//g, out], "bias": ...}

int4 packing: input rows (2k, 2k+1) share byte k — low nibble = row 2k,
high nibble = row 2k+1; nibble values are q+8 with q ∈ [-7, 7]
(symmetric; the -8 code is unused by the quantizer).
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


def quantize_linear_int4(kernel, group: int = 128):
    """[..., in, out] float → (packed uint8 [..., in//2, out],
    fp32 scale [..., in//group, out]).

    Symmetric grouped absmax: q = clip(round(w/scale), -7, 7) with
    scale = absmax(group)/7; stored biased (q+8) two-per-byte. Groups
    run along the *input* dim (the matmul contraction), so dequant is a
    reshape-multiply that XLA fuses ahead of the GEMM. Falls back to a
    single group when ``in % group != 0`` (tiny test configs)."""
    k = np.asarray(kernel, np.float32)
    *lead, cin, cout = k.shape
    if cin % 2:
        raise ValueError(f"int4 packing needs even input dim, got {cin}")
    g = group if cin % group == 0 else cin
    kg = k.reshape(*lead, cin // g, g, cout)
    absmax = np.max(np.abs(kg), axis=-2, keepdims=True)
    scale = absmax / 7.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(kg / scale), -7, 7).astype(np.int8)
    q = q.reshape(*lead, cin, cout)
    biased = (q + 8).astype(np.uint8)
    packed = biased[..., 0::2, :] | (biased[..., 1::2, :] << 4)
    return packed, scale.squeeze(-2).astype(np.float32)


def quantize_activations(x):
    """Per-token dynamic symmetric int8: (xq int8, sx fp32 [..., 1]).

    The W8A8 runtime half: absmax over the feature (contraction) dim of
    each token, so ``x ≈ xq · sx`` and the weight's per-out-channel
    scale commutes with the int32 accumulation."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def int8_matmul(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """int8 [..., K] × int8 [K, N] → int32 [..., N] (MXU int8 path:
    2× bf16 peak on v5e)."""
    return jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def dequantize_leaf(p: Dict[str, Any], dtype):
    """Device-side just-in-time dequant of a quantized linear leaf →
    [..., in, out] ``dtype`` kernel. Understands both 'q8' and 'q4'."""
    if "q8" in p:
        return p["q8"].astype(dtype) * p["scale"].astype(dtype)[..., None, :]
    packed = p["q4"]
    lo = (packed & np.uint8(0xF)).astype(jnp.int8) - 8
    hi = (packed >> np.uint8(4)).astype(jnp.int8) - 8
    q = jnp.stack([lo, hi], axis=-2)           # [..., in//2, 2, out]
    *lead, half, _, cout = q.shape
    cin = half * 2
    scale = p["scale"]
    ng = scale.shape[-2]
    kq = q.reshape(*lead, ng, cin // ng, cout).astype(dtype)
    k = kq * scale.astype(dtype)[..., :, None, :]
    return k.reshape(*lead, cin, cout)


def quantize_wan_params(params: Dict[str, Any],
                        use_numpy: bool = True,
                        bits: int = 8,
                        group: int = 128,
                        act8: bool = False) -> Dict[str, Any]:
    """Quantize the block linears of a WanModel param tree (host-side by
    default so a 28 GB bf16 tree never needs device residence).

    ``act8=True`` (W8A8, requires ``bits=8``) marks each quantized leaf
    so the model's dense ops ALSO quantize activations per-token at
    runtime and run int8×int8→int32 matmuls — the v5e MXU's int8 path
    has 2× the bf16 peak. Per-output-channel weight scales factor out of
    the contraction, which is why this needs int8 (int4's per-group
    scales along the contraction dim do not)."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if act8 and bits != 8:
        raise ValueError("act8 (W8A8) requires bits=8")

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            if "kernel" in tree and "/".join(path).endswith(
                    _TARGET_SUFFIXES):
                if bits == 8:
                    q, s = quantize_linear(tree["kernel"], use_numpy)
                    out = {"q8": q, "scale": s}
                    if act8:
                        # leading layer axis so lax.scan can slice it
                        out["a8"] = np.ones(
                            (tree["kernel"].shape[0],), np.int8)
                else:
                    q, s = quantize_linear_int4(tree["kernel"], group)
                    out = {"q4": q, "scale": s}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        return tree

    return rebuild(params)


def save_quantized_checkpoint(path: str, tree: Dict[str, Any],
                              metadata: Dict[str, str] = None) -> None:
    """Serialize a quantized param tree to safetensors ('/'-joined
    keys). Lets serving deployments quantize the full-precision
    checkpoint ONCE and afterwards load the compact tree directly
    (int4 14B: ~8 GB read instead of a 28 GB load + minutes of
    quantization per process start). ``metadata`` (str→str) is stored in
    the safetensors header — used for source-checkpoint fingerprints so
    stale caches are detected."""
    from safetensors.numpy import save_file

    flat: Dict[str, np.ndarray] = {}

    def walk(t, p=()):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, p + (k,))
        else:
            flat["/".join(p)] = np.asarray(t)

    walk(tree)
    save_file(flat, path, metadata=metadata)


def read_quantized_metadata(path: str) -> Dict[str, str]:
    """Read the safetensors header metadata of a quantized cache (empty
    dict if none)."""
    from safetensors import safe_open

    with safe_open(path, framework="numpy") as f:
        return dict(f.metadata() or {})


def load_quantized_checkpoint(path: str) -> Dict[str, Any]:
    """Inverse of ``save_quantized_checkpoint`` (host numpy tree)."""
    from safetensors.numpy import load_file

    tree: Dict[str, Any] = {}
    for key, value in load_file(path).items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


_T5_TARGETS = ("attn/q", "attn/k", "attn/v", "attn/o",
               "ffn/gate", "ffn/fc1", "ffn/fc2")


def quantize_t5_params(params: Dict[str, Any], bits: int = 4,
                       group: int = 128,
                       quantize_embedding: bool = True) -> Dict[str, Any]:
    """Weight-only quantize a T5 param tree (models/t5.py layout: block
    linears are raw [L, in, out] arrays, not {'kernel': ...} dicts).

    umT5-XXL at int4 drops from 11.6 GB bf16 to ~3.4 GB (2.3 GB block
    codes + 1.05 GB int8 per-row vocab table + scales) — small enough to
    stay device-resident next to the int4 14B DiT on one 16 GB chip,
    replacing the host-offload path's minutes-long CPU encode. Norms and
    per-layer rel-pos embeddings stay full precision."""
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")

    def rebuild(tree, path=()):
        if isinstance(tree, dict):
            return {k: rebuild(v, path + (k,)) for k, v in tree.items()}
        joined = "/".join(path)
        if path and path[0] == "blocks" and joined.endswith(_T5_TARGETS):
            w = np.asarray(tree, np.float32)
            if bits == 8:
                q, s = quantize_linear(w)
                return {"q8": q, "scale": s}
            q, s = quantize_linear_int4(w, group)
            return {"q4": q, "scale": s}
        if joined == "token_embedding" and quantize_embedding:
            w = np.asarray(tree, np.float32)          # [V, d]
            absmax = np.max(np.abs(w), axis=-1)       # per-row
            scale = np.where(absmax == 0, 1.0, absmax / 127.0)
            q = np.clip(np.round(w / scale[:, None]), -127,
                        127).astype(np.int8)
            return {"q8": q, "scale": scale.astype(np.float32)}
        return tree

    return rebuild(params)


import functools


@functools.partial(jax.jit, static_argnums=(0, 1))
def _pattern_bytes_impl(shape, dtype, salt):
    axis = int(np.argmax(shape))
    iota = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    bytes_ = ((iota * 31 + salt) % 251).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(bytes_, dtype)


def _pattern_bytes(shape, dtype, salt: int):
    """Deterministic varied bytes with a trivial program: a multiplied
    iota over the largest axis, wrapped mod a prime. Benchmark-
    equivalent to random weights (params are runtime jit arguments —
    values cannot be constant-folded; MXU throughput is value-
    independent) while avoiding billion-element threefry programs.

    MUST run under jit: eagerly, the int32 iota and each arithmetic
    intermediate materialize (~4x the leaf — 5.7 GB for the 14B FFN
    leaf, the OOM that killed 14B-int4 runs whenever anything else was
    resident); fused, XLA writes the uint8 leaf directly."""
    return _pattern_bytes_impl(tuple(shape), jnp.dtype(dtype), salt)


def host_init_quantized_t5(seed: int, cfg, bits: int = 4,
                           group: int = 128) -> Dict[str, Any]:
    """Random quantized T5 encoder params built host-side (numpy
    pattern bytes — seconds, vs minutes of numpy RNG). For the
    upload-encode-free serving pattern where the quantized encoder
    lives on the host between prompts."""
    d, da, df, L = cfg.dim, cfg.dim_attn, cfg.dim_ffn, cfg.num_layers
    counter = [0]

    def nextsalt():
        counter[0] += 1
        return seed * 1009 + counter[0] * 97

    def pat(shape, dtype):
        axis = int(np.argmax(shape))
        idx = np.arange(shape[axis], dtype=np.int64)
        bcast = idx.reshape([-1 if i == axis else 1
                             for i in range(len(shape))])
        vals = ((bcast * 31 + nextsalt()) % 251).astype(np.uint8)
        return np.broadcast_to(vals, shape).view(dtype).copy()

    def qlin(cin, cout):
        if bits == 4:
            g = group if cin % group == 0 else cin
            return {"q4": pat((L, cin // 2, cout), np.uint8),
                    "scale": np.full((L, cin // g, cout),
                                     0.34 / np.sqrt(cin), np.float32)}
        return {"q8": pat((L, cin, cout), np.int8),
                "scale": np.full((L, cout), 0.02 / np.sqrt(cin),
                                 np.float32)}

    rng = np.random.default_rng(seed)
    return {
        "token_embedding": {
            "q8": pat((cfg.vocab_size, d), np.int8),
            "scale": np.full((cfg.vocab_size,), 1.0 / 127.0, np.float32),
        },
        "blocks": {
            "norm1": {"weight": np.ones((L, d), np.float32)},
            "attn": {"q": qlin(d, da), "k": qlin(d, da),
                     "v": qlin(d, da), "o": qlin(da, d)},
            "norm2": {"weight": np.ones((L, d), np.float32)},
            "ffn": {"gate": qlin(d, df), "fc1": qlin(d, df),
                    "fc2": qlin(df, d)},
            "pos_embedding": (rng.standard_normal(
                (L, cfg.num_buckets, cfg.num_heads)).astype(np.float32)
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
        },
        "norm": {"weight": np.ones((d,), np.float32)},
    }


def device_init_quantized_t5(seed: int, cfg, bits: int = 4,
                             group: int = 128) -> Dict[str, Any]:
    """Random quantized T5 encoder params materialized directly in HBM
    (models/t5.py layout) — the smoke-test analog of
    ``device_init_quantized_wan``: umT5-XXL host init + quantize costs
    >10 min of numpy; this takes seconds."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed ^ 0x7E5)
    counter = [0]

    def nextkey():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def nextsalt():
        counter[0] += 1
        return seed * 1009 + counter[0] * 97

    L, d, da, df = cfg.num_layers, cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def qlin(cin, cout):
        if bits == 4:
            g = group if cin % group == 0 else cin
            return {
                "q4": _pattern_bytes((L, cin // 2, cout), jnp.uint8,
                                     nextsalt()),
                "scale": jnp.full((L, cin // g, cout),
                                  0.34 / np.sqrt(cin), jnp.float32),
            }
        return {
            "q8": _pattern_bytes((L, cin, cout), jnp.int8, nextsalt()),
            "scale": jnp.full((L, cout), 0.02 / np.sqrt(cin),
                              jnp.float32),
        }

    return {
        "token_embedding": {
            "q8": _pattern_bytes((cfg.vocab_size, d), jnp.int8,
                                 nextsalt()),
            "scale": jnp.full((cfg.vocab_size,), 1.0 / 127.0,
                              jnp.float32),
        },
        "blocks": {
            "norm1": {"weight": jnp.ones((L, d), jnp.bfloat16)},
            "attn": {"q": qlin(d, da), "k": qlin(d, da),
                     "v": qlin(d, da), "o": qlin(da, d)},
            "norm2": {"weight": jnp.ones((L, d), jnp.bfloat16)},
            "ffn": {"gate": qlin(d, df), "fc1": qlin(d, df),
                    "fc2": qlin(df, d)},
            "pos_embedding": jax.random.normal(
                nextkey(), (L, cfg.num_buckets, cfg.num_heads),
                jnp.float32) * (2 * cfg.num_buckets
                                * cfg.num_heads) ** -0.5,
        },
        "norm": {"weight": jnp.ones((d,), jnp.bfloat16)},
    }


def device_init_quantized_wan(seed: int, cfg, bits: int = 8,
                              group: int = 128,
                              act8: bool = False) -> Dict[str, Any]:
    """Random int8-quantized params materialized directly in device HBM.

    ``host_init_quantized_wan`` builds the ~13 GB 14B tree with numpy
    (minutes of single-thread RNG) and then pays a full host→device
    upload — through the remote-TPU relay that alone can take minutes.
    Here every leaf is generated on device by JAX PRNG (int8 leaves via
    ``jax.random.randint``), so a 14B tree exists only in HBM and init
    takes seconds. Tree layout is identical to ``host_init_quantized_wan``.
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    counter = [0]

    def nextkey():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def nextsalt():
        counter[0] += 1
        return seed * 1009 + counter[0] * 97

    d, fd, L = cfg.dim, cfg.ffn_dim, cfg.num_layers

    def rand_bytes(shape, dtype):
        return _pattern_bytes(shape, dtype, nextsalt())

    def q8(shape_in_out):
        cin, cout = shape_in_out
        if bits == 4:
            g = group if cin % group == 0 else cin
            return {
                # random bytes: nibble 0 decodes to -8 (outside the
                # packer's [-7,7] range) — harmless for random init
                "q4": rand_bytes((L, cin // 2, cout), jnp.uint8),
                "scale": jnp.full((L, cin // g, cout),
                                  0.34 / np.sqrt(cin), jnp.float32),
                "bias": jnp.zeros((L, cout), jnp.bfloat16),
            }
        leaf = {
            "q8": rand_bytes((L, *shape_in_out), jnp.int8),
            "scale": jnp.full((L, shape_in_out[-1]),
                              0.02 / np.sqrt(shape_in_out[0]),
                              jnp.float32),
            "bias": jnp.zeros((L, shape_in_out[-1]), jnp.bfloat16),
        }
        if act8:
            leaf["a8"] = jnp.ones((L,), jnp.int8)
        return leaf

    def attn(img=False):
        p = {"q": q8((d, d)), "k": q8((d, d)), "v": q8((d, d)),
             "o": q8((d, d)),
             "norm_q": {"scale": jnp.ones((L, d), jnp.float32)},
             "norm_k": {"scale": jnp.ones((L, d), jnp.float32)}}
        if img:
            p["k_img"] = q8((d, d))
            p["v_img"] = q8((d, d))
            p["norm_k_img"] = {"scale": jnp.ones((L, d), jnp.float32)}
        return p

    import math

    patch_in = cfg.in_dim * int(np.prod(cfg.patch_size))

    def lin(cin, cout, dtype=jnp.bfloat16, std=0.02):
        return {
            "kernel": (jax.random.normal(nextkey(), (cin, cout),
                                         jnp.float32) * std).astype(dtype),
            "bias": jnp.zeros((cout,), dtype),
        }

    blocks = {
        "self_attn": attn(),
        "cross_attn": attn(img=cfg.model_type == "i2v"),
        "ffn": {"fc1": q8((d, fd)), "fc2": q8((fd, d))},
        "modulation": (jax.random.normal(nextkey(), (L, 6, d),
                                         jnp.float32) / math.sqrt(d)),
    }
    if cfg.cross_attn_norm:
        blocks["norm3"] = {"scale": jnp.ones((L, d), jnp.float32),
                           "bias": jnp.zeros((L, d), jnp.float32)}
    return {
        "patch_embedding": lin(patch_in, d),
        "text_embedding": {"fc1": lin(cfg.text_dim, d),
                           "fc2": lin(d, d)},
        "time_embedding": {
            "fc1": lin(cfg.freq_dim, d, jnp.float32),
            "fc2": lin(d, d, jnp.float32)},
        "time_projection": {"fc": lin(d, 6 * d, jnp.float32)},
        "blocks": blocks,
        "head": {
            "head": lin(d, int(np.prod(cfg.patch_size)) * cfg.out_dim,
                        jnp.float32),
            "modulation": (jax.random.normal(nextkey(), (2, d),
                                             jnp.float32) / math.sqrt(d)),
        },
    }


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
