"""umT5-XXL text encoder — TPU-native JAX implementation.

Parity target: ``wan/modules/t5.py`` (T5Encoder with per-layer relative
position bias, ``shared_pos=False``, encoder-only umT5-XXL: 24 layers,
dim 4096, ffn 10240 GEGLU, 64 heads, vocab 256384).

TPU-native notes:
- blocks are **stacked and scanned** (per-layer rel-pos embeddings stack
  too, since every layer owns one — t5.py:167-168);
- the relative-position *bucket* matrix depends only on (Lq, Lk), both
  static under jit — computed once in numpy and closed over;
- attention has no √d scaling (t5.py:111-112) and computes softmax in
  fp32;
- dropout omitted (inference; the reference encoder is eval-only in every
  entry point).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import T5Config
from ..ops.norms import t5_rms_norm

Params = Dict[str, Any]


def relative_position_buckets(lq: int, lk: int, num_buckets: int = 32,
                              max_dist: int = 128,
                              bidirectional: bool = True) -> np.ndarray:
    """Log-bucketed relative positions (ref T5RelativeEmbedding,
    t5.py:245-264). Returns [lq, lk] int32 bucket ids."""
    rel_pos = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    if bidirectional:
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        rel_buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = nb // 2
    with np.errstate(divide="ignore"):
        rel_large = max_exact + (
            np.log(np.maximum(rel_pos, 1) / max_exact)
            / math.log(max_dist / max_exact) * (nb - max_exact)
        ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    rel_buckets = rel_buckets + np.where(rel_pos < max_exact, rel_pos,
                                         rel_large)
    return rel_buckets.astype(np.int32)


def _mm(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ w where w is a raw kernel or an int8/int4 weight-only leaf
    ({'q8'|'q4', 'scale'}; ops/quantization.py) dequantized
    just-in-time — lets the umT5-XXL encoder stay device-resident next
    to the int4 DiT on a 16 GB chip instead of host-offloaded."""
    if isinstance(w, dict):
        from moviigen_tpu.ops.quantization import dequantize_leaf

        return jnp.matmul(x, dequantize_leaf(w, x.dtype))
    return jnp.matmul(x, w)


def _embed(emb, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Vocab lookup in ``dtype`` (the tree's activation dtype);
    understands an int8 per-row quantized table ({'q8': int8 [V, d],
    'scale': f32 [V]} — saves ~1 GB for umT5-XXL's 256k × 4096 table)."""
    if isinstance(emb, dict):
        return (jnp.take(emb["q8"], ids, axis=0).astype(dtype)
                * jnp.take(emb["scale"], ids, axis=0)[..., None]
                .astype(dtype))
    return jnp.take(emb, ids, axis=0).astype(dtype)


def _attn(p: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray],
          pos_bias: jnp.ndarray, cfg: T5Config) -> jnp.ndarray:
    """T5Attention (ref t5.py:69-120): einsum attention with additive
    position bias, no QK scaling, fp32 softmax."""
    b, l, _ = x.shape
    n, dh = cfg.num_heads, cfg.head_dim
    q = _mm(x, p["q"]).reshape(b, l, n, dh)
    k = _mm(x, p["k"]).reshape(b, l, n, dh)
    v = _mm(x, p["v"]).reshape(b, l, n, dh)

    logits = jnp.einsum("binc,bjnc->bnij", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits + pos_bias.astype(jnp.float32)
    if mask is not None:
        keymask = mask[:, None, None, :] != 0
        logits = jnp.where(keymask, logits, jnp.float32(-3.4e38))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnij,bjnc->binc", probs, v)
    return _mm(out.reshape(b, l, n * dh), p["o"])


def _ffn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """GEGLU feed-forward: fc1(x)·gelu_tanh(gate(x)) (ref t5.py:123-141)."""
    gate = jax.nn.gelu(_mm(x, p["gate"]), approximate=True)
    h = _mm(x, p["fc1"]) * gate
    return _mm(h, p["fc2"])


def encode(params: Params, ids: jnp.ndarray, mask: Optional[jnp.ndarray],
           cfg: T5Config) -> jnp.ndarray:
    """T5Encoder forward (ref t5.py:303-312). ids/mask: [B, L] →
    embeddings [B, L, dim] in the embedding dtype."""
    lq = lk = ids.shape[1]
    buckets = jnp.asarray(relative_position_buckets(
        lq, lk, cfg.num_buckets, bidirectional=True))  # [L, L]

    ids = jnp.clip(ids, 0, cfg.vocab_size - 1)
    x = _embed(params["token_embedding"], ids,
               params["norm"]["weight"].dtype)

    def body(carry, bp):
        x = carry
        # per-layer rel-pos bias: embedding [num_buckets, heads] → [1,N,L,L]
        e = jnp.take(bp["pos_embedding"], buckets, axis=0)  # [L, L, N]
        e = e.transpose(2, 0, 1)[None]
        h = t5_rms_norm(x, bp["norm1"]["weight"])
        x = x + _attn(bp["attn"], h, mask, e, cfg)
        h = t5_rms_norm(x, bp["norm2"]["weight"])
        x = x + _ffn(bp["ffn"], h)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_rms_norm(x, params["norm"]["weight"])


def decode(params: Params, ids: jnp.ndarray,
           encoder_states: jnp.ndarray,
           encoder_mask: Optional[jnp.ndarray],
           cfg: T5Config,
           mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """T5Decoder forward (ref t5.py:315-369): causal self-attention with
    unidirectional relative position bias + cross-attention over encoder
    states. Present for full umT5 surface parity (the reference ships the
    decoder but never runs it at runtime, SURVEY §2.1)."""
    b, s = ids.shape
    buckets = jnp.asarray(relative_position_buckets(
        s, s, cfg.num_buckets, bidirectional=False))

    causal = np.tril(np.ones((s, s), np.float32))
    if mask is not None:
        causal = causal[None] * mask[:, None, :].astype(np.float32) \
            if isinstance(mask, np.ndarray) else \
            jnp.tril(jnp.broadcast_to(mask[:, None, :], (b, s, s))
                     .astype(jnp.float32))
    attn_mask3 = jnp.asarray(causal)
    if attn_mask3.ndim == 2:
        attn_mask3 = attn_mask3[None]

    ids = jnp.clip(ids, 0, cfg.vocab_size - 1)
    x = _embed(params["token_embedding"], ids,
               params["norm"]["weight"].dtype)

    def body(carry, bp):
        x = carry
        e = jnp.take(bp["pos_embedding"], buckets, axis=0)
        e = e.transpose(2, 0, 1)[None]
        h = t5_rms_norm(x, bp["norm1"]["weight"])
        # causal self-attention (3D mask)
        logits = jnp.einsum(
            "binc,bjnc->bnij",
            _mm(h, bp["attn"]["q"]).reshape(
                b, s, cfg.num_heads, cfg.head_dim),
            _mm(h, bp["attn"]["k"]).reshape(
                b, s, cfg.num_heads, cfg.head_dim),
            preferred_element_type=jnp.float32) + e.astype(jnp.float32)
        logits = jnp.where(attn_mask3[:, None] != 0, logits,
                           jnp.float32(-3.4e38))
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        v = _mm(h, bp["attn"]["v"]).reshape(
            b, s, cfg.num_heads, cfg.head_dim)
        sa = jnp.einsum("bnij,bjnc->binc", probs, v).reshape(b, s, -1)
        x = x + _mm(sa, bp["attn"]["o"])
        # cross-attention over encoder states (no pos bias)
        h = t5_rms_norm(x, bp["norm2"]["weight"])
        q = _mm(h, bp["cross_attn"]["q"]).reshape(
            b, s, cfg.num_heads, cfg.head_dim)
        k = _mm(encoder_states, bp["cross_attn"]["k"]).reshape(
            b, -1, cfg.num_heads, cfg.head_dim)
        cv = _mm(encoder_states, bp["cross_attn"]["v"]).reshape(
            b, -1, cfg.num_heads, cfg.head_dim)
        logits = jnp.einsum("binc,bjnc->bnij", q, k,
                            preferred_element_type=jnp.float32)
        if encoder_mask is not None:
            keym = encoder_mask[:, None, None, :] != 0
            logits = jnp.where(keym, logits, jnp.float32(-3.4e38))
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        ca = jnp.einsum("bnij,bjnc->binc", probs, cv).reshape(b, s, -1)
        x = x + _mm(ca, bp["cross_attn"]["o"])
        # ffn
        h = t5_rms_norm(x, bp["norm3"]["weight"])
        x = x + _ffn(bp["ffn"], h)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_rms_norm(x, params["norm"]["weight"])


# --------------------------------------------------------------------------
# init / conversion
# --------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: T5Config, dtype=jnp.bfloat16) -> Params:
    """Random init mirroring ref ``init_weights`` (t5.py:27-43)."""
    keys = iter(jax.random.split(key, 8))
    d, da, df = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def blk(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm1": {"weight": jnp.ones((d,), dtype)},
            "attn": {
                "q": (d * da) ** -0.5 * jax.random.normal(
                    next(ks), (d, da), dtype),
                "k": d ** -0.5 * jax.random.normal(next(ks), (d, da), dtype),
                "v": d ** -0.5 * jax.random.normal(next(ks), (d, da), dtype),
                "o": (cfg.num_heads * cfg.head_dim) ** -0.5
                * jax.random.normal(next(ks), (da, d), dtype),
            },
            "norm2": {"weight": jnp.ones((d,), dtype)},
            "ffn": {
                "gate": d ** -0.5 * jax.random.normal(next(ks), (d, df), dtype),
                "fc1": d ** -0.5 * jax.random.normal(next(ks), (d, df), dtype),
                "fc2": df ** -0.5 * jax.random.normal(next(ks), (df, d), dtype),
            },
            "pos_embedding": (2 * cfg.num_buckets * cfg.num_heads) ** -0.5
            * jax.random.normal(next(ks), (cfg.num_buckets, cfg.num_heads),
                                jnp.float32),
        }

    blocks = jax.vmap(blk)(jax.random.split(next(keys), cfg.num_layers))
    return {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, d), dtype),
        "blocks": blocks,
        "norm": {"weight": jnp.ones((d,), dtype)},
    }


def expected_t5_encoder_keys(cfg: T5Config) -> set:
    """Key census of the reference ``T5Encoder`` state dict
    (wan/modules/t5.py:265-310; umT5 uses ``shared_pos=False`` so every
    block carries its own rel-pos embedding, t5.py:467) — exactly what
    ``convert_t5_state_dict`` consumes."""
    keys = {"token_embedding.weight", "norm.weight"}
    for i in range(cfg.num_layers):
        keys.add(f"blocks.{i}.norm1.weight")
        keys.add(f"blocks.{i}.norm2.weight")
        for p in ("q", "k", "v", "o"):
            keys.add(f"blocks.{i}.attn.{p}.weight")
        keys.add(f"blocks.{i}.ffn.gate.0.weight")
        keys.add(f"blocks.{i}.ffn.fc1.weight")
        keys.add(f"blocks.{i}.ffn.fc2.weight")
        keys.add(f"blocks.{i}.pos_embedding.embedding.weight")
    return keys


def expected_t5_decoder_keys(cfg: T5Config) -> set:
    """Key census of the reference ``T5Decoder`` (wan/modules/t5.py:
    315-369) — exactly what ``convert_t5_decoder_state_dict`` consumes."""
    keys = {"token_embedding.weight", "norm.weight"}
    for i in range(cfg.num_layers):
        for nrm in ("norm1", "norm2", "norm3"):
            keys.add(f"blocks.{i}.{nrm}.weight")
        for attn in ("self_attn", "cross_attn"):
            for p in ("q", "k", "v", "o"):
                keys.add(f"blocks.{i}.{attn}.{p}.weight")
        keys.add(f"blocks.{i}.ffn.gate.0.weight")
        keys.add(f"blocks.{i}.ffn.fc1.weight")
        keys.add(f"blocks.{i}.ffn.fc2.weight")
        keys.add(f"blocks.{i}.pos_embedding.embedding.weight")
    return keys


def convert_t5_state_dict(sd, cfg: T5Config, dtype=jnp.bfloat16,
                          as_numpy: bool = False,
                          strict: bool = True) -> Params:
    """Torch T5Encoder state dict → stacked pytree. Linear weights [O,I]
    transpose to [I,O]; per-layer tensors stack along a leading axis.
    Built host-side (numpy + ml_dtypes); uploaded unless ``as_numpy``.
    ``strict`` errors on unconsumed checkpoint keys (census.py)."""
    from .census import TrackedStateDict

    sd = TrackedStateDict(sd, "T5Encoder checkpoint")
    import ml_dtypes

    np_dtype = np.dtype(ml_dtypes.bfloat16) \
        if jnp.dtype(dtype) == jnp.bfloat16 else np.dtype(dtype)

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T) \
            .astype(np_dtype)

    def stack(fmt, conv=None):
        conv = conv or t
        return np.stack([conv(fmt.format(i))
                         for i in range(cfg.num_layers)])

    def stack_raw(fmt, dt):
        return np.stack([
            np.asarray(sd[fmt.format(i)]).astype(dt)
            for i in range(cfg.num_layers)])

    blocks = {
        "norm1": {"weight": stack_raw("blocks.{}.norm1.weight", np_dtype)},
        "attn": {
            "q": stack("blocks.{}.attn.q.weight"),
            "k": stack("blocks.{}.attn.k.weight"),
            "v": stack("blocks.{}.attn.v.weight"),
            "o": stack("blocks.{}.attn.o.weight"),
        },
        "norm2": {"weight": stack_raw("blocks.{}.norm2.weight", np_dtype)},
        "ffn": {
            "gate": stack("blocks.{}.ffn.gate.0.weight"),
            "fc1": stack("blocks.{}.ffn.fc1.weight"),
            "fc2": stack("blocks.{}.ffn.fc2.weight"),
        },
        "pos_embedding": stack_raw(
            "blocks.{}.pos_embedding.embedding.weight", np.float32),
    }
    params = {
        "token_embedding":
            np.asarray(sd["token_embedding.weight"]).astype(np_dtype),
        "blocks": blocks,
        "norm": {"weight":
                 np.asarray(sd["norm.weight"]).astype(np_dtype)},
    }
    if strict:
        sd.check_all_consumed()
    if not as_numpy:
        params = jax.tree_util.tree_map(jnp.asarray, params)
    return params


def host_init_params(seed: int, cfg: T5Config, dtype="bfloat16") -> Params:
    """Random init entirely on the host (numpy) — for offloaded smoke
    runs where a device round-trip of the 11.6 GB encoder is wasteful.
    Same distributions as ``init_params`` (draw streams differ)."""
    import ml_dtypes

    np_dtype = np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16" \
        else np.dtype(dtype)
    rng = np.random.default_rng(seed)
    d, da, df = cfg.dim, cfg.dim_attn, cfg.dim_ffn

    def normal(shape, std):
        return (rng.standard_normal(shape, dtype=np.float32) * std) \
            .astype(np_dtype)

    blocks = {
        "norm1": {"weight": np.ones((cfg.num_layers, d), np_dtype)},
        "attn": {
            "q": normal((cfg.num_layers, d, da), (d * da) ** -0.5),
            "k": normal((cfg.num_layers, d, da), d ** -0.5),
            "v": normal((cfg.num_layers, d, da), d ** -0.5),
            "o": normal((cfg.num_layers, da, d),
                        (cfg.num_heads * cfg.head_dim) ** -0.5),
        },
        "norm2": {"weight": np.ones((cfg.num_layers, d), np_dtype)},
        "ffn": {
            "gate": normal((cfg.num_layers, d, df), d ** -0.5),
            "fc1": normal((cfg.num_layers, d, df), d ** -0.5),
            "fc2": normal((cfg.num_layers, df, d), df ** -0.5),
        },
        "pos_embedding": (rng.standard_normal(
            (cfg.num_layers, cfg.num_buckets, cfg.num_heads),
            dtype=np.float32)
            * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
    }
    return {
        "token_embedding": normal((cfg.vocab_size, d), 1.0),
        "blocks": blocks,
        "norm": {"weight": np.ones((d,), np_dtype)},
    }


def convert_t5_decoder_state_dict(sd, cfg: T5Config,
                                  dtype=jnp.float32,
                                  strict: bool = True) -> Params:
    """Torch T5Decoder state dict → stacked pytree."""
    from .census import TrackedStateDict

    sd = TrackedStateDict(sd, "T5Decoder checkpoint")

    def t(name):
        return jnp.asarray(np.asarray(sd[name]), dtype).T

    def stack(fmt):
        return jnp.stack([t(fmt.format(i)) for i in range(cfg.num_layers)])

    def stack_raw(fmt, dt):
        return jnp.stack([
            jnp.asarray(np.asarray(sd[fmt.format(i)]), dt)
            for i in range(cfg.num_layers)])

    blocks = {
        "norm1": {"weight": stack_raw("blocks.{}.norm1.weight", dtype)},
        "attn": {p: stack("blocks.{}.self_attn.%s.weight" % p)
                 for p in ("q", "k", "v", "o")},
        "norm2": {"weight": stack_raw("blocks.{}.norm2.weight", dtype)},
        "cross_attn": {p: stack("blocks.{}.cross_attn.%s.weight" % p)
                       for p in ("q", "k", "v", "o")},
        "norm3": {"weight": stack_raw("blocks.{}.norm3.weight", dtype)},
        "ffn": {
            "gate": stack("blocks.{}.ffn.gate.0.weight"),
            "fc1": stack("blocks.{}.ffn.fc1.weight"),
            "fc2": stack("blocks.{}.ffn.fc2.weight"),
        },
        "pos_embedding": stack_raw(
            "blocks.{}.pos_embedding.embedding.weight", jnp.float32),
    }
    params = {
        "token_embedding": jnp.asarray(
            np.asarray(sd["token_embedding.weight"]), dtype),
        "blocks": blocks,
        "norm": {"weight": jnp.asarray(np.asarray(sd["norm.weight"]),
                                       dtype)},
    }
    if strict:
        sd.check_all_consumed()
    return params


def load_t5_checkpoint(path: str, cfg: T5Config,
                       dtype=jnp.bfloat16, as_numpy: bool = False,
                       strict: bool = True) -> Params:
    """Load ``models_t5_umt5-xxl-enc-bf16.pth`` → pytree. Requires torch.
    ``as_numpy`` keeps the tree on the host (offload mode)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_t5_state_dict(sd, cfg, dtype, as_numpy=as_numpy,
                                 strict=strict)
