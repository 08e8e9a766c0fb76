"""WanModel — the Wan2.1/MoviiGen 14B diffusion transformer, TPU-native.

Parity target: ``wan/modules/model.py`` (WanModel, WanAttentionBlock, Head,
sinusoidal_embedding_1d). Architecture: 3D patch-embed → ``num_layers``
AdaLN-modulated blocks (self-attn with 3D RoPE, text cross-attn, GELU-tanh
FFN) → 2-way-modulated head → unpatchify.

TPU-native design decisions (vs the torch reference):

- **One model definition.** The reference maintains three forks (inference
  model.py, training model_seq.py, USP monkey-patches). Here parallelism is
  applied around this single functional forward (see ``parallel/``).
- **Stacked block parameters + ``lax.scan``** over layers: one compiled
  block body instead of 40 unrolled, natural remat boundary, and leading
  layer axis for FSDP-style sharding.
- **Patch embedding as a reshaped matmul**: the reference uses Conv3d with
  kernel==stride (model.py:445-450); for non-overlapping patches this is
  exactly a reshape + one large MXU matmul.
- **Fixed padded ``[B, L, C]`` tensors** with static shapes instead of
  list-of-videos python padding (model.py:529-538) — jit-friendly; the
  padding semantics (zero-pad tokens to ``seq_len``, mask keys beyond the
  true length) are identical.
- **Explicit fp32 islands** replacing autocast: time embeddings, AdaLN
  modulation arithmetic, norm statistics, the residual stream, and the
  head all run in fp32 exactly where the reference pins fp32
  (model.py:292-302, 307-309, 340-343, 541-545); matmul inputs are cast
  to the param dtype (bf16).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import WanModelConfig
from ..ops.attention import attention
from ..ops.norms import layer_norm, rms_norm
from ..ops.rope import RopeTables, rope_apply

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------


def _xavier(key, shape, dtype):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _linear(key, d_in, d_out, dtype, init="xavier", std=0.02, zero=False):
    kkey, _ = jax.random.split(key)
    if zero:
        kernel = jnp.zeros((d_in, d_out), dtype)
    elif init == "normal":
        kernel = std * jax.random.normal(kkey, (d_in, d_out), dtype)
    else:
        kernel = _xavier(kkey, (d_in, d_out), dtype)
    return {"kernel": kernel, "bias": jnp.zeros((d_out,), dtype)}


def init_params(key: jax.Array, cfg: WanModelConfig,
                dtype=jnp.bfloat16) -> Params:
    """Random initialization mirroring ``WanModel.init_weights``
    (model.py:611-633): xavier linears, std-0.02 text/time embeddings,
    zero-init head."""
    keys = iter(jax.random.split(key, 64))
    d, fd = cfg.dim, cfg.ffn_dim
    patch_in = cfg.in_dim * int(np.prod(cfg.patch_size))

    def block_init(bkey):
        bk = iter(jax.random.split(bkey, 16))

        def attn(k1, img=False):
            ks = iter(jax.random.split(k1, 8))
            p = {
                "q": _linear(next(ks), d, d, dtype),
                "k": _linear(next(ks), d, d, dtype),
                "v": _linear(next(ks), d, d, dtype),
                "o": _linear(next(ks), d, d, dtype),
            }
            if cfg.qk_norm:
                p["norm_q"] = {"scale": jnp.ones((d,), jnp.float32)}
                p["norm_k"] = {"scale": jnp.ones((d,), jnp.float32)}
            if img:  # i2v image-token k/v (ref model.py:194-197)
                p["k_img"] = _linear(next(ks), d, d, dtype)
                p["v_img"] = _linear(next(ks), d, d, dtype)
                if cfg.qk_norm:
                    p["norm_k_img"] = {"scale": jnp.ones((d,), jnp.float32)}
            return p

        p = {
            "self_attn": attn(next(bk)),
            "cross_attn": attn(next(bk), img=cfg.model_type == "i2v"),
            "ffn": {
                "fc1": _linear(next(bk), d, fd, dtype),
                "fc2": _linear(next(bk), fd, d, dtype),
            },
            # ref model.py:272: randn(1, 6, dim)/sqrt(dim), fp32
            "modulation": jax.random.normal(
                next(bk), (6, d), jnp.float32) / math.sqrt(d),
        }
        if cfg.cross_attn_norm:
            p["norm3"] = {"scale": jnp.ones((d,), jnp.float32),
                          "bias": jnp.zeros((d,), jnp.float32)}
        return p

    num_l = cfg.num_layers
    blocks = jax.vmap(block_init)(jax.random.split(next(keys), num_l))

    params: Params = {
        "patch_embedding": _linear(next(keys), patch_in, d, dtype),
        "text_embedding": {
            "fc1": _linear(next(keys), cfg.text_dim, d, dtype,
                           init="normal"),
            "fc2": _linear(next(keys), d, d, dtype, init="normal"),
        },
        "time_embedding": {
            "fc1": _linear(next(keys), cfg.freq_dim, d, jnp.float32,
                           init="normal"),
            "fc2": _linear(next(keys), d, d, jnp.float32, init="normal"),
        },
        "time_projection": {
            "fc": _linear(next(keys), d, d * 6, jnp.float32),
        },
        "blocks": blocks,
        "head": {
            "head": _linear(next(keys), d,
                            int(np.prod(cfg.patch_size)) * cfg.out_dim,
                            jnp.float32, zero=True),
            "modulation": jax.random.normal(
                next(keys), (2, d), jnp.float32) / math.sqrt(d),
        },
    }
    if cfg.model_type == "i2v":
        ks = iter(jax.random.split(next(keys), 4))
        params["img_emb"] = {
            "norm1": {"scale": jnp.ones((1280,), jnp.float32),
                      "bias": jnp.zeros((1280,), jnp.float32)},
            "fc1": _linear(next(ks), 1280, 1280, dtype),
            "fc2": _linear(next(ks), 1280, d, dtype),
            "norm2": {"scale": jnp.ones((d,), jnp.float32),
                      "bias": jnp.zeros((d,), jnp.float32)},
        }
    return params


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------


def _lora_side(p: Params, x: jnp.ndarray, out: jnp.ndarray) -> jnp.ndarray:
    """Rank-r LoRA side path: ``out + (x @ lora_A) @ lora_B``.

    ``lora_B`` arrives pre-scaled by alpha/rank (training/lora.py
    ``attach_lora``). The base leaf stays untouched — for int4/int8
    frozen bases (QLoRA) the packed bytes never see the delta; the two
    rank-r GEMMs are ~r/d of the base GEMM's FLOPs and XLA fuses the
    add into the projection epilogue. Same math as ``merge_lora`` up to
    float association (x@(W+AB) vs x@W + (x@A)@B)."""
    cd = out.dtype
    h = jnp.matmul(x.astype(cd), p["lora_A"].astype(cd))
    return out + jnp.matmul(h, p["lora_B"].astype(cd))


def _dense(p: Params, x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """x @ kernel + bias, casting x to the kernel dtype (autocast analog).

    fp32 matmuls use HIGHEST precision — on TPU the default lowers fp32
    matmuls to bf16 passes, which would silently break the reference's
    fp32 islands (time embed / head).

    Int8/int4 weight-only leaves ({'q8'|'q4', 'scale'};
    ops/quantization.py) dequantize just-in-time: one bf16 [in, out]
    transient per layer. Leaves marked 'a8' (W8A8) instead quantize the
    activations per-token and run the matmul int8×int8→int32 on the
    MXU's double-rate int8 path. Leaves carrying ``lora_A``/``lora_B``
    (attach_lora) get the rank-r side path added after the base GEMM."""
    if "q8" in p or "q4" in p:
        from moviigen_tpu.ops.quantization import (dequantize_leaf,
                                                   int8_matmul,
                                                   quantize_activations)

        cd = dtype or jnp.bfloat16
        if "a8" in p and p["q8"].ndim == 2:
            xq, sx = quantize_activations(x)
            acc = int8_matmul(xq, p["q8"])
            out = (acc.astype(jnp.float32) * sx
                   * p["scale"]).astype(cd)
            if "bias" in p:
                out = out + p["bias"].astype(cd)
            if "lora_A" in p:
                out = _lora_side(p, x, out)
            return out
        k = dequantize_leaf(p, cd)
        prec = jax.lax.Precision.HIGHEST if cd == jnp.float32 else None
        out = jnp.matmul(x.astype(cd), k, precision=prec)
        if "bias" in p:
            out = out + p["bias"].astype(cd)
        if "lora_A" in p:
            out = _lora_side(p, x, out)
        return out
    k = p["kernel"]
    if dtype is not None:
        k = k.astype(dtype)
        x = x.astype(dtype)
    else:
        x = x.astype(k.dtype)
    prec = jax.lax.Precision.HIGHEST if k.dtype == jnp.float32 else None
    out = jnp.matmul(x, k, precision=prec)
    if "bias" in p:
        out = out + p["bias"].astype(k.dtype)
    if "lora_A" in p:
        out = _lora_side(p, x, out)
    return out


# Above this concatenated-output size the fused multi-GEMM's [B, L, ΣN]
# transient costs more HBM than the width buys in MXU utilization
# (at 75.6k tokens the fused QKV transient alone is 4.33 GB — the
# single biggest allocation in the 14B@720P OOM); each projection is
# already ≥5120 wide at flagship scale, so separate GEMMs lose nothing.
_FUSE_BYTES_LIMIT = 1 << 30


def _dense_multi(ps, x: jnp.ndarray, dtype=None):
    """Several projections of the SAME input as ONE wide GEMM.

    TPU MXU throughput scales with the output width: measured on v5e,
    [L,1536]x[1536,1536] runs at ~59 TF/s while [L,1536]x[1536,4608]
    runs at ~150 TF/s — so q/k/v (and cross k/v) are computed as a single
    concatenated matmul and split, which is the same arithmetic per
    output column. Handles the int8 weight-only form like ``_dense``.

    At long sequence the fused output transient dominates HBM instead
    (see ``_FUSE_BYTES_LIMIT``) — falls back to per-projection GEMMs,
    which are bit-identical (same contraction per output column)."""
    total_out = sum(
        (p["kernel"] if "kernel" in p else p.get("q8", p.get("q4")))
        .shape[-1] for p in ps)
    n_tokens = 1
    for s in x.shape[:-1]:
        n_tokens *= s
    if 2 * n_tokens * total_out > _FUSE_BYTES_LIMIT:
        return [_dense(p, x, dtype) for p in ps]

    def kern(p, cd):
        if "q8" in p or "q4" in p:
            from moviigen_tpu.ops.quantization import dequantize_leaf

            return dequantize_leaf(p, cd)
        return p["kernel"].astype(cd) if dtype is not None else p["kernel"]

    cd = dtype or (jnp.bfloat16
                   if any("q8" in p or "q4" in p for p in ps)
                   else ps[0]["kernel"].dtype)

    if all("a8" in p and p.get("q8") is not None and p["q8"].ndim == 2
           for p in ps):
        # W8A8 wide GEMM: quantize the shared input once, one
        # int8×int8→int32 matmul over the concatenated kernels
        from moviigen_tpu.ops.quantization import (int8_matmul,
                                                   quantize_activations)

        xq, sx = quantize_activations(x)
        kcat = jnp.concatenate([p["q8"] for p in ps], axis=-1)
        scat = jnp.concatenate([p["scale"] for p in ps], axis=-1)
        bcat = jnp.concatenate([p["bias"].astype(jnp.float32)
                                for p in ps], axis=-1)
        out = (int8_matmul(xq, kcat).astype(jnp.float32) * sx * scat
               + bcat).astype(cd)
        sizes = [p["q8"].shape[-1] for p in ps]
        splits = np.cumsum(sizes)[:-1].tolist()
        outs = jnp.split(out, splits, axis=-1)
        return [_lora_side(p, x, o) if "lora_A" in p else o
                for p, o in zip(ps, outs)]

    ks = [kern(p, cd) for p in ps]
    sizes = [k.shape[-1] for k in ks]
    kcat = jnp.concatenate(ks, axis=-1)
    bcat = jnp.concatenate([p["bias"].astype(cd) for p in ps], axis=-1)
    prec = jax.lax.Precision.HIGHEST if kcat.dtype == jnp.float32 else None
    out = jnp.matmul(x.astype(cd), kcat, precision=prec) + bcat
    splits = np.cumsum(sizes)[:-1].tolist()
    outs = jnp.split(out, splits, axis=-1)
    return [_lora_side(p, x, o) if "lora_A" in p else o
            for p, o in zip(ps, outs)]


def sinusoidal_embedding_1d(dim: int, position: jnp.ndarray) -> jnp.ndarray:
    """[cos | sin] sinusoidal embedding (ref model.py:15-25; fp64 there,
    fp32 here — difference is below bf16 noise, unit-tested)."""
    half = dim // 2
    pos = position.astype(jnp.float32)
    freqs = jnp.power(
        jnp.float32(10000.0),
        -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = pos[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


def _qkv_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _serialize(carry):
    """Order an unrolled stream's iterations without a dynamic loop.

    The fori stream impls rely on the loop carry to force iterations to
    run serially so one iteration's transients die before the next's
    are allocated. A plain Python unroll has no such edge: XLA's
    scheduler floats several chunks'/groups' projections live at once,
    which measured +3.2 GB of temps at the 131k-token flagship point
    (over the 16 GB v5e budget). An ``optimization_barrier`` on the
    carry restores the serial buffer lifetime with zero math."""
    return jax.lax.optimization_barrier(carry)


def _slice1(a, start, size: int, axis: int):
    """Slice helper that lowers to a STATIC slice when ``start`` is a
    python int (the unrolled stream impl) and a dynamic slice when it
    is traced (the fori impl)."""
    if isinstance(start, (int, np.integer)):
        return jax.lax.slice_in_dim(a, int(start), int(start) + size,
                                    axis=axis)
    return jax.lax.dynamic_slice_in_dim(a, start, size, axis=axis)


def _slice_cols_dyn(p: Params, start, cols: int) -> Params:
    """Column-slice a (possibly quantized) linear param tree along the
    output dim at a traced offset. Works for all leaf formats: dense
    {'kernel'}, int8 {'q8', 'scale'[out]}, int4 {'q4'[in//2, out],
    'scale'[in//g, out]} — every tensor's last axis is the output dim."""
    sl = {}
    for key in ("kernel", "q8", "q4", "scale", "bias", "lora_B"):
        if key in p:
            a = p[key]
            sl[key] = _slice1(a, start, cols, axis=a.ndim - 1)
    if "lora_A" in p:
        sl["lora_A"] = p["lora_A"]  # input-side factor: no out-dim axis
    if "a8" in p:
        sl["a8"] = p["a8"]
    return sl


def _can_row_slice(p: Params, rows: int) -> bool:
    """True when a linear leaf can be sliced along its INPUT dim in
    ``rows``-row pieces: int4 packs two input rows per byte and groups
    its scales along the input dim, so both must divide ``rows``."""
    if "q4" in p:
        cin = p["q4"].shape[0] * 2
        gsz = cin // p["scale"].shape[0]
        return rows % 2 == 0 and rows % gsz == 0
    return True


def _slice_rows_dyn(p: Params, start, rows: int) -> Params:
    """Row-slice (input/contraction dim) of a linear param tree at a
    traced offset: ``x_cols @ kernel[start:start+rows]``. The bias is
    deliberately DROPPED — a row slice contributes a partial sum, and
    the caller adds the whole-layer bias exactly once. ``start`` must
    be a multiple of the int4 packing (2) and quant group when those
    formats are present (see ``_can_row_slice``)."""
    sl = {}
    if "kernel" in p:
        sl["kernel"] = _slice1(p["kernel"], start, rows, axis=0)
    if "q8" in p:
        sl["q8"] = _slice1(p["q8"], start, rows, axis=0)
        sl["scale"] = p["scale"]  # int8 scales are per-OUTPUT channel
    if "q4" in p:
        cin = p["q4"].shape[0] * 2
        gsz = cin // p["scale"].shape[0]
        sl["q4"] = _slice1(p["q4"], start // 2, rows // 2, axis=0)
        sl["scale"] = _slice1(p["scale"], start // gsz, rows // gsz,
                              axis=0)
    if "lora_A" in p:
        # input-dim slice of the A factor; (x_rows @ A_rows) @ B is a
        # valid partial sum of the side path, like the kernel slice
        sl["lora_A"] = _slice1(p["lora_A"], start, rows, axis=0)
        sl["lora_B"] = p["lora_B"]
    if "a8" in p:
        sl["a8"] = p["a8"]
    return sl


def _self_attention_head_chunked(p: Params, x: jnp.ndarray,
                                 cfg: WanModelConfig, rope: RopeTables,
                                 k_lens: Optional[jnp.ndarray],
                                 compute_dtype,
                                 attn_backend: str) -> jnp.ndarray:
    """Self-attention computed ``attn_head_chunk`` heads at a time,
    returning the PRE-o-projection accumulator [B, L, dim] (heads
    concatenated). The caller applies ``p['o']`` — either whole
    (``self_attention``) or streamed into the residual in token chunks
    (``attention_block``'s long-sequence path).

    Same math as ``self_attention`` with bounded HBM: only one head
    group's q/k/v/out ([B, L, hc, D]) is live at once instead of the
    full [B, L, N, D] set (4 x 1.34 GB at 131k tokens / 40 heads).
    ``lax.fori_loop`` (not an unrolled Python loop) for two reasons:
    the loop carry *forces* groups to run serially so XLA's scheduler
    cannot float every group's projections live at once, and the body
    compiles once instead of ng times (the remote compile helper is
    the bottleneck at flagship scale).

    The reference's qk RMS-norm is over the FULL projection dim
    (model.py:70-86,144-146), so the statistic needs all of q/k: a
    first pass over head groups accumulates per-token sum-of-squares
    (recomputing the q/k GEMM slices — ~4% extra step FLOPs at 131k
    where attention dominates), then the second pass normalizes each
    group with the shared inverse-RMS. Equal to the unchunked path up
    to fp32 summation order of the norm statistic.
    """
    b, l, d = x.shape
    hd = cfg.head_dim
    hc = cfg.attn_head_chunk
    cols = hc * hd
    ng = cfg.num_heads // hc
    unroll = cfg.stream_impl == "unroll"

    inv_q, inv_k = _qk_fulldim_stats(p, x, cfg, compute_dtype, ng, cols,
                                     unroll=unroll)

    def group_body(g, out):
        og = _group_attention(p, x, g, cols, hc, inv_q, inv_k, cfg,
                              rope, k_lens, compute_dtype, attn_backend)
        return jax.lax.dynamic_update_slice_in_dim(
            out, og, g * hc, axis=2)

    out = jnp.zeros((b, l, cfg.num_heads, hd), compute_dtype)
    if unroll:
        for g in range(ng):
            out = _serialize(group_body(g, out))
    else:
        out = jax.lax.fori_loop(0, ng, group_body, out)
    return out.reshape(b, l, d)


def _qk_fulldim_stats(p: Params, x: jnp.ndarray, cfg: WanModelConfig,
                      compute_dtype, ng: int, cols: int,
                      unroll: bool = False):
    """Per-token inverse-RMS of the FULL q/k projections (the
    reference's qk-norm statistic spans all heads, model.py:70-86),
    accumulated a head group at a time — recomputes the q/k GEMM
    slices (~4% step FLOPs at 131k where attention dominates) instead
    of holding full q/k live."""
    if not cfg.qk_norm:
        return None, None
    b, l, d = x.shape

    def stat_body(g, carry):
        ssq, ssk = carry
        qg = _dense(_slice_cols_dyn(p["q"], g * cols, cols), x,
                    compute_dtype)
        kg = _dense(_slice_cols_dyn(p["k"], g * cols, cols), x,
                    compute_dtype)
        ssq = ssq + jnp.sum(jnp.square(qg.astype(jnp.float32)),
                            axis=-1, keepdims=True)
        ssk = ssk + jnp.sum(jnp.square(kg.astype(jnp.float32)),
                            axis=-1, keepdims=True)
        return ssq, ssk

    carry = (jnp.zeros((b, l, 1), jnp.float32),
             jnp.zeros((b, l, 1), jnp.float32))
    if unroll:
        for g in range(ng):
            carry = _serialize(stat_body(g, carry))
        ssq, ssk = carry
    else:
        ssq, ssk = jax.lax.fori_loop(0, ng, stat_body, carry)
    return (jax.lax.rsqrt(ssq / d + cfg.eps),
            jax.lax.rsqrt(ssk / d + cfg.eps))


def _group_attention(p: Params, x: jnp.ndarray, g, cols: int, hc: int,
                     inv_q, inv_k, cfg: WanModelConfig,
                     rope: RopeTables, k_lens, compute_dtype,
                     attn_backend: str) -> jnp.ndarray:
    """One head group's q/k/v projections + qk-norm + RoPE + attention
    → [B, L, hc, head_dim] (pre-o-projection)."""
    b, l, _ = x.shape
    hd = cfg.head_dim
    qg = _dense(_slice_cols_dyn(p["q"], g * cols, cols), x, compute_dtype)
    kg = _dense(_slice_cols_dyn(p["k"], g * cols, cols), x, compute_dtype)
    vg = _dense(_slice_cols_dyn(p["v"], g * cols, cols), x, compute_dtype)
    if cfg.qk_norm:
        # rms_norm's exact dtype discipline: fp32 normalize, cast
        # back, THEN the scale slice in the activation dtype
        sq = jax.lax.dynamic_slice_in_dim(
            p["norm_q"]["scale"], g * cols, cols, axis=0)
        sk = jax.lax.dynamic_slice_in_dim(
            p["norm_k"]["scale"], g * cols, cols, axis=0)
        qg = (qg.astype(jnp.float32) * inv_q).astype(qg.dtype) \
            * sq.astype(qg.dtype)
        kg = (kg.astype(jnp.float32) * inv_k).astype(kg.dtype) \
            * sk.astype(kg.dtype)
    qg = rope_apply(qg.reshape(b, l, hc, hd), rope)
    kg = rope_apply(kg.reshape(b, l, hc, hd), rope)
    vg = vg.reshape(b, l, hc, hd)
    return attention(qg, kg, vg, k_lens=k_lens, backend=attn_backend,
                     compute_dtype=compute_dtype)


def _self_attention_streamed(p: Params, x: jnp.ndarray, xm: jnp.ndarray,
                             cfg: WanModelConfig, rope: RopeTables,
                             k_lens, compute_dtype, attn_backend: str,
                             e2: jnp.ndarray,
                             chunk: Optional[int]) -> jnp.ndarray:
    """Head-group self-attention whose o-projection streams straight
    into the residual: ``x += (attn_g @ Wo[rows_g]) * e2`` per group.
    Removes both the [B, L, N, D] accumulator and its fori
    double-buffer (2 x 1.34 GB at 131k tokens) — with the in-place
    stage streams this is what fits 14B 1080P-81f on 16 GB.

    ``chunk=None`` (cfg.attn_o_chunk) applies each group's update as
    ONE whole-L elementwise add — no dynamic_update_slice in the whole
    self-attention path. A chunk token-streams the update in place,
    bounding the per-group [B, L, D] o-projection transient. NOTE: on
    the axon-v5e worker every streamed self-attention form, this one
    included, faults at execute at 14B dims (bisect rung E14, r5 —
    docs/performance.md "Bisect rung verdicts", final); the path stays
    for other hardware revisions behind the serving guard.
    The o-projection's row slices partial-sum over groups (identical
    contraction, fp32 adds reordered); the bias is added exactly once
    at the end. ``x`` is the residual, ``xm`` the AdaLN-modulated
    input driving the projections."""
    b, l, d = xm.shape
    hc = cfg.attn_head_chunk
    cols = hc * cfg.head_dim
    ng = cfg.num_heads // hc
    unroll = cfg.stream_impl == "unroll"

    inv_q, inv_k = _qk_fulldim_stats(p, xm, cfg, compute_dtype, ng, cols,
                                     unroll=unroll)

    def group_body(g, xb):
        og = _group_attention(p, xm, g, cols, hc, inv_q, inv_k, cfg,
                              rope, k_lens, compute_dtype, attn_backend)
        og = og.reshape(b, l, cols)
        wo = _slice_rows_dyn(p["o"], g * cols, cols)
        return _stream_residual(
            xb, chunk,
            lambda xc, oc: _dense(wo, oc, compute_dtype)
            .astype(jnp.float32) * e2,
            aux=og, unroll=unroll)

    if unroll:
        for g in range(ng):
            x = _serialize(group_body(g, x))
    else:
        x = jax.lax.fori_loop(0, ng, group_body, x)
    if "bias" in p["o"]:
        x = (x.astype(jnp.float32)
             + p["o"]["bias"].astype(jnp.float32) * e2).astype(x.dtype)
    return x


def _self_attention_bwd_chunked(p: Params, xm: jnp.ndarray,
                                cfg: WanModelConfig, rope: RopeTables,
                                k_lens, compute_dtype,
                                attn_backend: str,
                                chunk: int) -> jnp.ndarray:
    """AD-friendly q-chunked self-attention (training dual of the
    serving-side ``_self_attention_streamed``, which is forward-only).

    Full k/v are projected once (every q row attends to all keys); the
    q side — projection → qk-norm → RoPE → attention → o-projection —
    is scanned over token chunks with a per-chunk ``jax.checkpoint``,
    so during ONE chunk's backward only that chunk's q/rope/attn-out/
    o-proj transients are live instead of the full-L set. The r3
    finding (docs/performance.md "Production-sequence-length training")
    was that ~8 GB of full-L attention transients bound 75,600-token
    training; this bounds them at [B, chunk, ·].

    Numerics: per-q-row softmax is independent of other rows, so the
    forward is identical to ``self_attention`` up to the fused-GEMM
    split (same contraction per output column); k/v weight-gradient
    contributions accumulate across chunks (fp32 adds reordered).
    """
    b, l, d = xm.shape
    from ..ops.rope import full_width_tables, rope_rotate

    k, v = _dense_multi([p["k"], p["v"]], xm, compute_dtype)
    if cfg.qk_norm:
        k = rms_norm(k, p["norm_k"]["scale"], eps=cfg.eps)
    # Cast the rope'd k (fp32 out of rope_apply) to the attention
    # compute dtype ONCE, outside the scan: ``attention`` would apply
    # the same cast per chunk (identical numerics), but hoisting it
    # frees the 2.7 GB fp32 k at 131k tokens before the scan starts
    # and saves a [B, L, N, D] cast per iteration.
    k = rope_apply(_qkv_heads(k, cfg.num_heads), rope).astype(compute_dtype)
    v = _qkv_heads(v, cfg.num_heads)

    c = _divisor_chunk(l, chunk)
    cos2, sin2 = full_width_tables(rope, l, cfg.head_dim)
    # Stack token chunks as the scan xs. For B=1 (the long-sequence
    # serving case) the [l//c, c, d] form is a pure reshape of xm — a
    # bitcast, so the scan reads xm's own buffer; the B>1 transpose
    # form materializes a [B, L, D] copy (1.34 GB at 131k tokens),
    # which the memory probe showed sitting in the program's peak.
    if b == 1:
        xs = xm.reshape(l // c, c, d)
    else:
        xs = xm.reshape(b, l // c, c, d).transpose(1, 0, 2, 3)
    cos_s = cos2.reshape(l // c, c, cfg.head_dim)
    sin_s = sin2.reshape(l // c, c, cfg.head_dim)

    def chunk_fn(xc, cosc, sinc):
        if b == 1:
            xc = xc[None]  # [1, c, d]
        qc = _dense(p["q"], xc, compute_dtype)
        if cfg.qk_norm:
            qc = rms_norm(qc, p["norm_q"]["scale"], eps=cfg.eps)
        qc = rope_rotate(_qkv_heads(qc, cfg.num_heads), cosc, sinc)
        oc = attention(qc, k, v, k_lens=k_lens, backend=attn_backend,
                       compute_dtype=compute_dtype)
        oc = _dense(p["o"], oc.reshape(b, c, d), compute_dtype)
        return oc[0] if b == 1 else oc

    chunk_ckpt = jax.checkpoint(chunk_fn)

    def body(_, inp):
        xc, cosc, sinc = inp
        return None, chunk_ckpt(xc, cosc, sinc)

    _, ys = jax.lax.scan(body, None, (xs, cos_s, sin_s))
    if b == 1:
        return ys.reshape(1, l, d)  # bitcast — no stacked-output copy
    return ys.transpose(1, 0, 2, 3).reshape(b, l, d)


def _head_chunked(cfg: WanModelConfig, attn_fn) -> bool:
    hc = cfg.attn_head_chunk
    return bool(hc and attn_fn is None and 0 < hc < cfg.num_heads
                and cfg.num_heads % hc == 0)


def self_attention(p: Params, x: jnp.ndarray, cfg: WanModelConfig,
                   rope: RopeTables, k_lens: Optional[jnp.ndarray],
                   compute_dtype, attn_backend: str,
                   attn_fn=None) -> jnp.ndarray:
    """WanSelfAttention (ref model.py:102-156): full-dim RMS qk-norm,
    3D RoPE on q/k, non-causal attention with key-length masking."""
    if _head_chunked(cfg, attn_fn):
        acc = _self_attention_head_chunked(
            p, x, cfg, rope, k_lens, compute_dtype, attn_backend)
        return _dense(p["o"], acc, compute_dtype)
    q, k, v = _dense_multi([p["q"], p["k"], p["v"]], x, compute_dtype)
    if cfg.qk_norm:
        q = rms_norm(q, p["norm_q"]["scale"], eps=cfg.eps)
        k = rms_norm(k, p["norm_k"]["scale"], eps=cfg.eps)
    q = _qkv_heads(q, cfg.num_heads)
    k = _qkv_heads(k, cfg.num_heads)
    v = _qkv_heads(v, cfg.num_heads)
    q = rope_apply(q, rope)
    k = rope_apply(k, rope)
    if attn_fn is None:
        out = attention(q, k, v, k_lens=k_lens, backend=attn_backend,
                        compute_dtype=compute_dtype)
    else:
        out = attn_fn(q, k, v, k_lens)
    b, l = out.shape[:2]
    return _dense(p["o"], out.reshape(b, l, cfg.dim), compute_dtype)


def _token_stream(x: jnp.ndarray, chunk: Optional[int], body,
                  unroll: bool = False):
    """Stream tokens through ``body`` in fixed chunks: per-token ops
    (FFN, cross-attention) have no cross-token coupling, so results are
    identical — only the [B, L, ·] transients shrink to [B, chunk, ·].

    Implemented as ``fori_loop`` + dynamic slices rather than
    ``lax.map``: map stacks the input as [n, B, chunk, D] and the output
    likewise (plus layout transposes), which *adds* ~4 copies of the
    [B, L, D] stream — measured via XLA memory_analysis at 131k tokens
    that overhead exceeded the transient being saved. Here the only
    extra buffer is the output (and a pad copy when chunk ∤ L).

    ``unroll=True`` (cfg.stream_impl): python loop + static slices +
    in-place updates at constant offsets — identical math and the same
    buffer structure, no dynamic loop around the kernel (the fori
    form's execute faults the axon worker, r3 bisect)."""
    b, l, d = x.shape
    if not chunk or l <= chunk:
        return body(x)
    lp = -(-l // chunk) * chunk
    xp = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x
    y_shape = jax.eval_shape(
        body, jax.ShapeDtypeStruct((b, chunk, d), x.dtype))
    out0 = jnp.zeros((b, lp, y_shape.shape[-1]), y_shape.dtype)

    def step(i, out):
        xc = _slice1(xp, i * chunk, chunk, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            out, body(xc), i * chunk, axis=1)

    if unroll:
        out = out0
        for i in range(lp // chunk):
            out = _serialize(step(i, out))
    else:
        out = jax.lax.fori_loop(0, lp // chunk, step, out0)
    return out[:, :l]


def _divisor_chunk(l: int, chunk: int) -> int:
    """Largest chunk <= ``chunk`` that divides ``l`` exactly (so the
    in-place residual stream needs no pad copy and no tail program).

    Must return a TRUE divisor: ``_stream_residual`` would silently
    skip the tail tokens' update and ``_chunked_delta_scan``'s reshape
    would fail at trace time otherwise. For awkward ``l`` whose largest
    divisor <= chunk is tiny (< chunk/8, e.g. near-prime lengths),
    falls back to ``l`` (no chunking) — a tiny chunk costs far more in
    loop overhead than the transient it saves."""
    c = min(chunk, l)
    while c > 1 and l % c:
        c -= 1
    return c if c >= max(1, chunk // 8) else l


def _stream_residual(x: jnp.ndarray, chunk: Optional[int], delta,
                     aux: Optional[jnp.ndarray] = None,
                     unroll: bool = False) -> jnp.ndarray:
    """In-place residual update ``x += delta(x_chunk[, aux_chunk])``
    streamed over token chunks.

    The key memory property vs ``_token_stream`` + add: the fori_loop
    carry IS the residual buffer — each iteration reads a [B, c, D]
    chunk, computes the stage's contribution, and writes the updated
    chunk back into the same buffer. A whole AdaLN stage (norm →
    modulate → GEMMs → scale → residual add) therefore keeps ONE
    persistent [B, L, D] array live instead of three-to-four (the
    modulated input, the stage output, and the new residual) — at 131k
    tokens each of those is 1.34 GB, and this collapse is what fits
    the 14B 1080P-81f forward on a 16 GB chip. Per-token math
    (LayerNorm over D, modulation broadcasts, row-blocked GEMMs) is
    identical to the unstreamed path bit-for-bit.

    ``delta`` computes in fp32 (modulation discipline, ref
    model.py:292-302); the add runs fp32 and writes back x.dtype.
    ``aux``: optional [B, L, ·] tensor sliced in lockstep with x
    (the self-attention accumulator for the streamed o-projection).
    """
    b, l, d = x.shape

    def upd(xc, auxc):
        dv = delta(xc) if auxc is None else delta(xc, auxc)
        return (xc.astype(jnp.float32) + dv.astype(jnp.float32)) \
            .astype(x.dtype)

    if not chunk or l <= chunk:
        return upd(x, aux)

    c = _divisor_chunk(l, chunk)

    def step(i, xb):
        xc = _slice1(xb, i * c, c, axis=1)
        auxc = None if aux is None else _slice1(aux, i * c, c, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            xb, upd(xc, auxc), i * c, axis=1)

    if unroll:
        for i in range(l // c):
            x = _serialize(step(i, x))
        return x
    return jax.lax.fori_loop(0, l // c, step, x)


def _cross_kv(p: Params, context: jnp.ndarray, cfg: WanModelConfig,
              compute_dtype):
    """Text k/v for cross-attention — computed once per block over the
    (512-token) context, tiny next to the query-side tensors."""
    k, v = _dense_multi([p["k"], p["v"]], context, compute_dtype)
    if cfg.qk_norm:
        k = rms_norm(k, p["norm_k"]["scale"], eps=cfg.eps)
    return _qkv_heads(k, cfg.num_heads), _qkv_heads(v, cfg.num_heads)


def _cross_q_body(p: Params, k, v, cfg: WanModelConfig, compute_dtype,
                  attn_backend: str):
    """Per-query-chunk cross-attention body (q-proj → attend → o-proj);
    the text context has no cross-query coupling, so chunked == whole."""
    def body(xc):
        q = _dense(p["q"], xc, compute_dtype)
        if cfg.qk_norm:
            q = rms_norm(q, p["norm_q"]["scale"], eps=cfg.eps)
        q = _qkv_heads(q, cfg.num_heads)
        out = attention(q, k, v, k_lens=None, backend=attn_backend,
                        compute_dtype=compute_dtype)
        bb, ll = out.shape[:2]
        return _dense(p["o"], out.reshape(bb, ll, cfg.dim), compute_dtype)

    return body


def cross_attention(p: Params, x: jnp.ndarray, context: jnp.ndarray,
                    cfg: WanModelConfig, compute_dtype,
                    attn_backend: str) -> jnp.ndarray:
    """WanT2VCrossAttention (ref model.py:159-181). The reference passes
    ``context_lens=None`` at runtime (model.py:548) so no key mask —
    zero-padded text tokens are attended to after the text MLP; we keep
    that exact behavior."""
    k, v = _cross_kv(p, context, cfg, compute_dtype)
    body = _cross_q_body(p, k, v, cfg, compute_dtype, attn_backend)
    return _token_stream(x, cfg.cross_attn_chunk, body,
                         unroll=cfg.stream_impl == "unroll")


def _i2v_cross_kv(p: Params, context: jnp.ndarray, cfg: WanModelConfig,
                  compute_dtype):
    """Text + CLIP-image k/v pairs (first 257 context tokens are image
    tokens with their own projections, ref model.py:206-207)."""
    ctx_img = context[:, :257]
    ctx_txt = context[:, 257:]

    def kv(pk, pv, norm_k, ctx):
        k, v = _dense_multi([pk, pv], ctx, compute_dtype)
        if norm_k is not None:
            k = rms_norm(k, norm_k["scale"], eps=cfg.eps)
        return _qkv_heads(k, cfg.num_heads), _qkv_heads(v, cfg.num_heads)

    k_t, v_t = kv(p["k"], p["v"], p.get("norm_k"), ctx_txt)
    k_i, v_i = kv(p["k_img"], p["v_img"], p.get("norm_k_img"), ctx_img)
    return k_t, v_t, k_i, v_i


def _i2v_cross_q_body(p: Params, k_t, v_t, k_i, v_i,
                      cfg: WanModelConfig, compute_dtype,
                      attn_backend: str):
    """Per-query-chunk i2v cross-attention body: text and image
    attention outputs are summed before the output projection."""
    def body(xc):
        q = _dense(p["q"], xc, compute_dtype)
        if cfg.qk_norm:
            q = rms_norm(q, p["norm_q"]["scale"], eps=cfg.eps)
        q = _qkv_heads(q, cfg.num_heads)
        out_t = attention(q, k_t, v_t, backend=attn_backend,
                          compute_dtype=compute_dtype)
        out_i = attention(q, k_i, v_i, backend=attn_backend,
                          compute_dtype=compute_dtype)
        out = out_t + out_i
        bb, ll = out.shape[:2]
        return _dense(p["o"], out.reshape(bb, ll, cfg.dim), compute_dtype)

    return body


def i2v_cross_attention(p: Params, x: jnp.ndarray, context: jnp.ndarray,
                        cfg: WanModelConfig, compute_dtype,
                        attn_backend: str) -> jnp.ndarray:
    """WanI2VCrossAttention (ref model.py:184-225): first 257 context
    tokens are CLIP image tokens with their own k/v projections; outputs
    are summed before the output projection."""
    k_t, v_t, k_i, v_i = _i2v_cross_kv(p, context, cfg, compute_dtype)
    body = _i2v_cross_q_body(p, k_t, v_t, k_i, v_i, cfg, compute_dtype,
                             attn_backend)
    return _token_stream(x, cfg.cross_attn_chunk, body,
                         unroll=cfg.stream_impl == "unroll")


def attention_block(bp: Params, x: jnp.ndarray, e0: jnp.ndarray,
                    context: jnp.ndarray, cfg: WanModelConfig,
                    rope: RopeTables, k_lens: Optional[jnp.ndarray],
                    compute_dtype, attn_backend: str,
                    self_attn_fn=None) -> jnp.ndarray:
    """WanAttentionBlock forward (ref model.py:274-313).

    ``x`` is the fp32 residual stream; matmul inputs are cast to
    ``compute_dtype``; all modulation arithmetic stays fp32 (ref asserts
    e.dtype == float32, model.py:292-302).
    """
    # e: [B, 6, C] fp32; per-block modulation parameter added (model.py:294)
    e = (bp["modulation"].astype(jnp.float32)[None] + e0)
    e = [e[:, i][:, None, :] for i in range(6)]  # six [B, 1, C]

    # self-attention with AdaLN scale/shift (model.py:298-302).
    # Modulation arithmetic is fp32; the result is cast to compute_dtype
    # HERE (not inside the projection matmul) so the fp32 [B, L, D]
    # modulated tensor fuses into one elementwise kernel writing
    # compute_dtype — under reference autocast the Linear input is cast
    # the same way, and at 75k tokens the difference is 1.4 GB of HBM
    # per site.
    # Residual adds compute in fp32 but write back the incoming
    # residual dtype: with a bf16 residual stream the promotion
    # `bf16 + fp32 -> fp32` would otherwise pin a persistent fp32
    # [B, L, D] copy of the stream for the REST of the block (2.7 GB
    # at 131k tokens, x3 sites) — XLA instead fuses the fp32 multiply-
    # add chain into one elementwise kernel writing rdt. For the
    # default fp32 stream the casts are no-ops (bit-identical).
    #
    # At long sequence each stage additionally streams its ENTIRE
    # norm→modulate→GEMM→scale→add pipeline in place through
    # ``_stream_residual`` (per-token math, numerics unchanged), so a
    # stage holds one persistent [B, L, D] buffer instead of 3-4 — the
    # collapse that fits 14B 1080P-81f (131k tokens) on a 16 GB chip.
    rdt = x.dtype

    # self-attention with AdaLN scale/shift (model.py:298-302)
    xm = (layer_norm(x, eps=1e-6, keep_fp32=True) * (1 + e[1])
          + e[0]).astype(compute_dtype)
    sa = bp["self_attn"]
    if (cfg.attn_o_stream and _head_chunked(cfg, self_attn_fn)
            and _can_row_slice(
                sa["o"], cfg.attn_head_chunk * cfg.head_dim)):
        x = _self_attention_streamed(
            sa, x, xm, cfg, rope, k_lens, compute_dtype, attn_backend,
            e[2], cfg.attn_o_chunk)
    elif (cfg.attn_bwd_chunk and self_attn_fn is None
          and not _head_chunked(cfg, self_attn_fn)):
        y = _self_attention_bwd_chunked(
            sa, xm, cfg, rope, k_lens, compute_dtype, attn_backend,
            cfg.attn_bwd_chunk)
        x = (x.astype(jnp.float32)
             + y.astype(jnp.float32) * e[2]).astype(rdt)
    else:
        y = self_attention(sa, xm, cfg, rope, k_lens,
                           compute_dtype, attn_backend,
                           attn_fn=self_attn_fn)
        x = (x.astype(jnp.float32)
             + y.astype(jnp.float32) * e[2]).astype(rdt)

    # cross-attention (model.py:305-306): text k/v computed once (512
    # tokens); the query side (norm3 → q → attend → o → add) is
    # per-token and streams in place when cross_attn_chunk is set
    ca_p = bp["cross_attn"]
    ca_backend = cfg.cross_attn_backend or attn_backend
    if cfg.model_type == "i2v":
        q_body = _i2v_cross_q_body(
            ca_p, *_i2v_cross_kv(ca_p, context, cfg, compute_dtype),
            cfg, compute_dtype, ca_backend)
    else:
        k, v = _cross_kv(ca_p, context, cfg, compute_dtype)
        q_body = _cross_q_body(ca_p, k, v, cfg, compute_dtype,
                               ca_backend)

    def cross_delta(xc):
        if cfg.cross_attn_norm:
            xn = layer_norm(xc, bp["norm3"]["scale"],
                            bp["norm3"]["bias"], eps=1e-6,
                            keep_fp32=True)
        else:
            xn = xc
        return q_body(xn.astype(compute_dtype))

    # NOTE (r5): q-chunking the cross attention here via attn_bwd_chunk
    # (_chunked_delta_scan over cross_delta) removes its whole-L
    # [N, L, text_len] score transient (1.25 GB bf16 at 14B/32,760) but
    # AOT-measured 5-6 GB WORSE total on XLA:TPU — the extra scan gives
    # the scheduler more concurrently-live per-chunk buffers than the
    # single wide attention it replaced. attn_bwd_chunk therefore stays
    # self-attention-only.
    x = _stream_residual(x, cfg.cross_attn_chunk, cross_delta,
                         unroll=cfg.stream_impl == "unroll")

    # FFN with AdaLN (model.py:307-309), streamed likewise
    def ffn_delta(xc):
        xf = (layer_norm(xc, eps=1e-6, keep_fp32=True) * (1 + e[4])
              + e[3]).astype(compute_dtype)
        y = _ffn(bp["ffn"], xf, cfg, compute_dtype)
        return y.astype(jnp.float32) * e[5]

    if cfg.ffn_bwd_chunk and not cfg.ffn_chunk:
        y = _chunked_delta_scan(x, cfg.ffn_bwd_chunk, ffn_delta)
        return (x.astype(jnp.float32) + y).astype(rdt)
    # The FFN stream stays fori even under stream_impl='unroll': the
    # fori FFN-only form is execute-proven on hardware (the 720P
    # headline runs it; the r3 crash bisect exonerated it), and fori's
    # carried-loop buffer profile is tighter than an unrolled chain —
    # only the streamed ATTENTION constructs need the workaround.
    return _stream_residual(x, cfg.ffn_chunk, ffn_delta)


def _chunked_delta_scan(x: jnp.ndarray, chunk: int, delta) -> jnp.ndarray:
    """AD-friendly token-chunked stage evaluation (training-side dual of
    ``_stream_residual``, which is forward-only: its fori_loop carries
    the full residual and autodiff saves that carry per iteration,
    GROWING memory — AOT-measured +3 GB at 32,760 tokens).

    Here chunks are scanned as stacked xs with a per-chunk
    ``jax.checkpoint``: the scan's saved inputs total one [B, L, D]
    (the chunks of x), and each chunk's FFN intermediate
    ([chunk, ffn_dim] instead of [L, ffn_dim] — 2×1.35 GB at 75,600
    tokens/1.3B) is recomputed transiently during that chunk's
    backward. Per-token math identical; only weight-gradient
    accumulation order changes (fp32 adds reordered)."""
    b, l, d = x.shape
    c = _divisor_chunk(l, chunk)
    xs = x.reshape(b, l // c, c, d).transpose(1, 0, 2, 3)
    delta_ckpt = jax.checkpoint(delta)

    def body(_, xc):
        return None, delta_ckpt(xc).astype(jnp.float32)

    _, ys = jax.lax.scan(body, None, xs)
    return ys.transpose(1, 0, 2, 3).reshape(b, l, d)


def _ffn(p: Params, xf: jnp.ndarray, cfg: WanModelConfig,
         compute_dtype) -> jnp.ndarray:
    """fc1 → GELU-tanh → fc2 (ref model.py:267-269,307-309).

    With ``cfg.ffn_chunk`` set, tokens stream through the FFN in chunks
    (``_token_stream``: fori_loop + dynamic slices) so the
    [B, chunk, ffn_dim] transient replaces the [B, L, ffn_dim] one —
    per-token arithmetic is unchanged (the FFN has no cross-token
    coupling), so numerics are identical. An earlier ``lax.map``
    version stacked an extra input copy AND the stacked output
    ([n, B, chunk, D] each, ~1.3 GB apiece at 131k tokens) on top of
    the streamed transient; fori + in-place dynamic_update_slice keeps
    only the output buffer."""
    def body(xc):
        h = _dense(p["fc1"], xc, compute_dtype)
        h = jax.nn.gelu(h, approximate=True)  # GELU-tanh (model.py:268)
        return _dense(p["fc2"], h, compute_dtype)

    # fori regardless of stream_impl — see the FFN-stage note in
    # attention_block (exonerated construct, tighter buffers).
    return _token_stream(xf, cfg.ffn_chunk, body)


# --------------------------------------------------------------------------
# full forward
# --------------------------------------------------------------------------


def patchify(x: jnp.ndarray, patch_size) -> jnp.ndarray:
    """[B, C, F, H, W] → [B, L, C·pt·ph·pw] token sequence.

    Equivalent to the reference's stride==kernel Conv3d (model.py:529)
    followed by flatten(2).transpose(1,2), expressed as a reshape so the
    embedding becomes a single MXU matmul. Channel ordering inside a patch
    matches Conv3d weight layout [C, pt, ph, pw] flattened.
    """
    b, c, f, h, w = x.shape
    pt, ph, pw = patch_size
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    # → [B, F', H', W', C, pt, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(x: jnp.ndarray, grid, patch_size, out_dim: int) -> jnp.ndarray:
    """[B, L, pt·ph·pw·c] → [B, c, F, H, W] (ref model.py:581-609,
    einsum 'fhwpqrc->cfphqwr')."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x[:, : f * h * w]
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def embed_inputs(params: Params, x: jnp.ndarray, t: jnp.ndarray,
                 context: jnp.ndarray, cfg: WanModelConfig,
                 seq_len: Optional[int] = None,
                 compute_dtype=jnp.bfloat16,
                 clip_fea: Optional[jnp.ndarray] = None,
                 y: Optional[jnp.ndarray] = None):
    """Patch-embed + time/text embeddings (ref model.py:523-558).

    Returns (tokens [B, L, D], e [B, D] fp32, e0 [B, 6, D] fp32,
    ctx [B, Lc, D], grid, k_lens)."""
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)

    b = x.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (x.shape[2] // pt, x.shape[3] // ph, x.shape[4] // pw)
    tokens = grid[0] * grid[1] * grid[2]

    xt = patchify(x, cfg.patch_size)
    xt = _dense(params["patch_embedding"], xt, compute_dtype)

    k_lens = None
    if seq_len is not None and seq_len > tokens:
        xt = jnp.pad(xt, ((0, 0), (0, seq_len - tokens), (0, 0)))
        k_lens = jnp.full((b,), tokens, jnp.int32)

    emb = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = _dense(params["time_embedding"]["fc1"], emb, jnp.float32)
    e = jax.nn.silu(e)
    e = _dense(params["time_embedding"]["fc2"], e, jnp.float32)
    e0 = _dense(params["time_projection"]["fc"], jax.nn.silu(e), jnp.float32)
    e0 = e0.reshape(b, 6, cfg.dim)

    ctx = _dense(params["text_embedding"]["fc1"], context, compute_dtype)
    ctx = jax.nn.gelu(ctx, approximate=True)
    ctx = _dense(params["text_embedding"]["fc2"], ctx, compute_dtype)

    if clip_fea is not None:
        ie = params["img_emb"]
        ci = layer_norm(clip_fea, ie["norm1"]["scale"], ie["norm1"]["bias"])
        ci = _dense(ie["fc1"], ci, compute_dtype)
        ci = jax.nn.gelu(ci, approximate=False)
        ci = _dense(ie["fc2"], ci, compute_dtype)
        ci = layer_norm(ci, ie["norm2"]["scale"], ie["norm2"]["bias"])
        ctx = jnp.concatenate([ci.astype(ctx.dtype), ctx], axis=1)

    return xt, e, e0, ctx, grid, k_lens


def run_blocks(params: Params, xt: jnp.ndarray, e0: jnp.ndarray,
               ctx: jnp.ndarray, cfg: WanModelConfig, rope: RopeTables,
               k_lens: Optional[jnp.ndarray],
               compute_dtype=jnp.bfloat16, attn_backend: str = "auto",
               remat: bool = False, self_attn_fn=None,
               param_gather_fn=None,
               residual_dtype=jnp.float32,
               remat_group: int = 1) -> jnp.ndarray:
    """Scan the AdaLN block stack over the fp32 residual stream.

    ``param_gather_fn`` (FSDP analog): applied to each layer's param
    slice inside the scan body — under ``shard_map`` it all-gathers
    weight shards just-in-time per layer (and its transpose
    reduce-scatters the weight grads), reproducing torch-FSDP
    FULL_SHARD-per-block behavior (ref wan/distributed/fsdp.py:17-31).

    ``remat_group=g`` (with ``remat``): nested (two-level) remat — the
    outer scan checkpoints every g-th residual, and each layer inside a
    group is checkpointed again. The saved carry stack shrinks from
    [layers, B, L, D] to [layers/g, B, L, D] (2.81 GB → 0.94 GB at
    32,760 tokens/1.3B with g=3) while per-layer backward transients
    stay 1x (a single-level group checkpoint instead keeps all g
    layers' FFN intermediates live at once — measured +14 GB via the
    AOT probe). Cost: one extra forward recompute vs per-layer remat
    (group re-runs once for the outer backward, each layer once more
    for its own) — the classic sqrt-remat memory/compute trade. The
    reference checkpoints per-block only (finetune.py:244-248)."""
    xr = xt.astype(residual_dtype)

    def layer(carry, bp):
        if param_gather_fn is not None:
            bp = param_gather_fn(bp)
        out = attention_block(bp, carry, e0, ctx, cfg, rope, k_lens,
                              compute_dtype, attn_backend,
                              self_attn_fn=self_attn_fn)
        return out.astype(residual_dtype), None

    blocks = params["blocks"]
    g = remat_group if remat else 1
    if g > 1:
        n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        if n % g:
            raise ValueError(f"remat_group={g} must divide the "
                             f"{n}-layer stack")
        blocks = jax.tree_util.tree_map(
            lambda a: a.reshape(n // g, g, *a.shape[1:]), blocks)

        layer_ckpt = jax.checkpoint(layer)

        def group_body(carry, gbp):
            out, _ = jax.lax.scan(layer_ckpt, carry, gbp)
            return out, None

        body_fn = jax.checkpoint(group_body)
    else:
        body_fn = jax.checkpoint(layer) if remat else layer
    xr, _ = jax.lax.scan(body_fn, xr, blocks)
    return xr


def head_output(params: Params, xr: jnp.ndarray, e: jnp.ndarray,
                cfg: WanModelConfig) -> jnp.ndarray:
    """Modulated output head (ref model.py:316-343), all-fp32.

    Streamed over token chunks when ``cfg.ffn_chunk`` is set: the
    modulated fp32 [B, L, D] input (2.7 GB at 131k tokens) would
    otherwise be the single largest live buffer of the whole forward
    after the stages stream in place; the head output is only
    [B, L, pt·ph·pw·out_dim] (64 wide), so streaming is pure savings.
    Per-token math — numerics identical."""
    hm = params["head"]["modulation"].astype(jnp.float32)[None] + e[:, None, :]

    def body(xc):
        xh = layer_norm(xc, eps=1e-6, keep_fp32=True) \
            * (1 + hm[:, 1][:, None, :]) + hm[:, 0][:, None, :]
        return _dense(params["head"]["head"], xh, jnp.float32)

    return _token_stream(xr, cfg.ffn_chunk, body,
                         unroll=cfg.stream_impl == "unroll")


def forward(params: Params, x: jnp.ndarray, t: jnp.ndarray,
            context: jnp.ndarray, cfg: WanModelConfig, rope: RopeTables,
            seq_len: Optional[int] = None,
            compute_dtype=jnp.bfloat16,
            attn_backend: str = "auto",
            remat: bool = False,
            residual_dtype=jnp.float32,
            remat_group: int = 1,
            clip_fea: Optional[jnp.ndarray] = None,
            y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Denoising forward pass (ref WanModel.forward, model.py:486-579).

    ``residual_dtype=bfloat16`` halves residual-stream memory (measured
    <1%% perf/parity impact at 1.3B; the default keeps the reference's
    fp32 residual discipline).

    Args:
        params: parameter pytree from ``init_params`` or the converter.
        x: [B, C_in, F, H, W] noisy latents (fp32).
        t: [B] diffusion timesteps.
        context: [B, text_len, text_dim] zero-padded text embeddings
            (the reference pads to text_len before the text MLP,
            model.py:549-554).
        rope: RopeTables for the (F/pt, H/ph, W/pw) grid (full sequence).
        seq_len: pad the token sequence to this length (ref model.py:535-538);
            defaults to the exact grid length.
        remat: rematerialize each block (training).
        clip_fea: [B, 257, 1280] CLIP features (i2v only).
        y: [B, C_y, F, H, W] conditioning video (i2v only; channel-concat,
            ref model.py:523-524).

    Returns:
        [B, C_out, F, H, W] prediction in fp32.
    """
    xt, e, e0, ctx, grid, k_lens = embed_inputs(
        params, x, t, context, cfg, seq_len=seq_len,
        compute_dtype=compute_dtype, clip_fea=clip_fea, y=y)
    xr = run_blocks(params, xt, e0, ctx, cfg, rope, k_lens,
                    compute_dtype=compute_dtype, attn_backend=attn_backend,
                    remat=remat, residual_dtype=residual_dtype,
                    remat_group=remat_group)
    out = head_output(params, xr, e, cfg)
    return unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
