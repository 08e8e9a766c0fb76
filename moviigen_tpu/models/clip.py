"""XLM-RoBERTa-CLIP (ViT-H/14) — image conditioning tower for i2v.

Parity target: ``wan/modules/clip.py`` + ``wan/modules/xlm_roberta.py``.
At runtime only the vision tower matters: ``visual()`` returns the
penultimate (31st) block's 257 tokens (CLS + 16×16 patches) that feed the
DiT's ``img_emb`` MLPProj (clip.py:527-542, ``use_31_block=True``). The
text tower ships in the checkpoint and is implemented for completeness.

TPU-native: stacked-layer ``lax.scan`` transformer, functional params,
bicubic resize via ``jax.image``; QuickGELU/GELU per config
(ViT-H/14 uses plain GELU, clip.py:488).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.norms import layer_norm

Params = Dict[str, Any]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT-H/14 (ref clip_xlm_roberta_vit_h_14, clip.py:471-499)."""

    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    out_dim: int = 1024
    num_heads: int = 16
    num_layers: int = 32
    pool_type: str = "token"
    pre_norm: bool = True
    post_norm: bool = False
    activation: str = "gelu"
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    """ref xlm_roberta.py:146-170."""

    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5


def _act(x, kind: str):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _attn_block(bp: Params, x: jnp.ndarray, num_heads: int, eps: float,
                activation: str, post_norm: bool,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Pre/post-norm ViT block (ref clip.py:111-153) with fused qkv."""
    b, s, c = x.shape
    d = c // num_heads

    def attn_part(h):
        qkv = jnp.matmul(h, bp["to_qkv"]["kernel"]) + bp["to_qkv"]["bias"]
        q, k, v = jnp.split(qkv.reshape(b, s, 3, num_heads, d)
                            .transpose(2, 0, 1, 3, 4), 3, axis=0)
        out = attention(q[0], k[0], v[0], k_lens=mask, backend="auto",
                        compute_dtype=h.dtype)
        out = out.reshape(b, s, c)
        return jnp.matmul(out, bp["proj"]["kernel"]) + bp["proj"]["bias"]

    def mlp_part(h):
        h = jnp.matmul(h, bp["fc1"]["kernel"]) + bp["fc1"]["bias"]
        h = _act(h, activation)
        return jnp.matmul(h, bp["fc2"]["kernel"]) + bp["fc2"]["bias"]

    if post_norm:
        x = x + layer_norm(attn_part(x), bp["norm1"]["scale"],
                           bp["norm1"]["bias"], eps=eps)
        x = x + layer_norm(mlp_part(x), bp["norm2"]["scale"],
                           bp["norm2"]["bias"], eps=eps)
    else:
        x = x + attn_part(layer_norm(x, bp["norm1"]["scale"],
                                     bp["norm1"]["bias"], eps=eps))
        x = x + mlp_part(layer_norm(x, bp["norm2"]["scale"],
                                    bp["norm2"]["bias"], eps=eps))
    return x


def vision_forward(params: Params, x: jnp.ndarray, cfg: CLIPVisionConfig,
                   use_31_block: bool = True) -> jnp.ndarray:
    """ViT forward (ref VisionTransformer.forward, clip.py:282-301).

    x: [B, 3, H, W] normalized images → [B, 257, dim] features from the
    first 31 blocks (``use_31_block``) or all 32.
    """
    b = x.shape[0]
    p = cfg.patch_size
    # stride==kernel conv → reshape matmul
    xh = x.reshape(b, 3, cfg.image_size // p, p, cfg.image_size // p, p)
    xh = xh.transpose(0, 2, 4, 1, 3, 5).reshape(b, cfg.num_patches,
                                                3 * p * p)
    xh = jnp.matmul(xh, params["patch_embedding"]["kernel"])
    if "bias" in params["patch_embedding"]:
        xh = xh + params["patch_embedding"]["bias"]

    cls = jnp.broadcast_to(params["cls_embedding"],
                           (b, 1, cfg.dim)).astype(xh.dtype)
    xh = jnp.concatenate([cls, xh], axis=1)
    xh = xh + params["pos_embedding"].astype(xh.dtype)

    if cfg.pre_norm:
        xh = layer_norm(xh, params["pre_norm"]["scale"],
                        params["pre_norm"]["bias"], eps=cfg.norm_eps)

    n_blocks = cfg.num_layers - 1 if use_31_block else cfg.num_layers

    def body(carry, bp):
        return _attn_block(bp, carry, cfg.num_heads, cfg.norm_eps,
                           cfg.activation, cfg.post_norm), None

    blocks = jax.tree_util.tree_map(lambda a: a[:n_blocks],
                                    params["blocks"])
    xh, _ = jax.lax.scan(body, xh, blocks)
    return xh


def text_forward(params: Params, ids: jnp.ndarray,
                 cfg: XLMRobertaConfig) -> jnp.ndarray:
    """XLM-RoBERTa text tower (ref xlm_roberta.py:118-143)."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = jnp.take(params["token_embedding"], ids, axis=0) \
        + params["type_embedding"][0][None, None] \
        + jnp.take(params["pos_embedding"], pos, axis=0)
    if cfg.post_norm:
        x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                       eps=cfg.eps)
    k_lens = mask.sum(axis=1)

    def body(carry, bp):
        return _attn_block(bp, carry, cfg.num_heads, cfg.eps,
                           "gelu", cfg.post_norm, mask=k_lens), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    if not cfg.post_norm:
        x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"],
                       eps=cfg.eps)
    return x


# --------------------------------------------------------------------------
# facade: video frame preprocessing + visual features
# --------------------------------------------------------------------------


def preprocess_frames(frames: jnp.ndarray, image_size: int = 224
                      ) -> jnp.ndarray:
    """[B, 3, H, W] in [-1, 1] → resized + CLIP-normalized
    (ref CLIPModel.visual, clip.py:527-540)."""
    b, c, h, w = frames.shape
    x = jax.image.resize(frames, (b, c, image_size, image_size),
                         method="bicubic")
    x = x * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN, x.dtype)[None, :, None, None]
    std = jnp.asarray(CLIP_STD, x.dtype)[None, :, None, None]
    return (x - mean) / std


def visual_features(params: Params, frames: jnp.ndarray,
                    cfg: CLIPVisionConfig = CLIPVisionConfig()
                    ) -> jnp.ndarray:
    """First-frame conditioning features for i2v: [B, 3, H, W] in [-1,1]
    → [B, 257, 1280]."""
    x = preprocess_frames(frames, cfg.image_size)
    return vision_forward(params, x, cfg, use_31_block=True)


# --------------------------------------------------------------------------
# init / conversion
# --------------------------------------------------------------------------


def init_vision_params(key: jax.Array, cfg: CLIPVisionConfig,
                       dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 8))
    gain = 1.0 / math.sqrt(cfg.dim)
    p = cfg.patch_size
    mid = int(cfg.dim * cfg.mlp_ratio)

    def blk(k):
        ks = iter(jax.random.split(k, 4))
        s = 1.0 / math.sqrt(cfg.dim)
        return {
            "norm1": {"scale": jnp.ones((cfg.dim,), jnp.float32),
                      "bias": jnp.zeros((cfg.dim,), jnp.float32)},
            "to_qkv": {"kernel": s * jax.random.normal(
                next(ks), (cfg.dim, 3 * cfg.dim), dtype),
                "bias": jnp.zeros((3 * cfg.dim,), dtype)},
            "proj": {"kernel": s * jax.random.normal(
                next(ks), (cfg.dim, cfg.dim), dtype),
                "bias": jnp.zeros((cfg.dim,), dtype)},
            "norm2": {"scale": jnp.ones((cfg.dim,), jnp.float32),
                      "bias": jnp.zeros((cfg.dim,), jnp.float32)},
            "fc1": {"kernel": s * jax.random.normal(
                next(ks), (cfg.dim, mid), dtype),
                "bias": jnp.zeros((mid,), dtype)},
            "fc2": {"kernel": s * jax.random.normal(
                next(ks), (mid, cfg.dim), dtype),
                "bias": jnp.zeros((cfg.dim,), dtype)},
        }

    blocks = jax.vmap(blk)(jax.random.split(next(keys), cfg.num_layers))
    params: Params = {
        # pre_norm=True → Conv2d bias=False (clip.py:252-257)
        "patch_embedding": {
            "kernel": gain * jax.random.normal(
                next(keys), (3 * p * p, cfg.dim), dtype)},
        "cls_embedding": gain * jax.random.normal(
            next(keys), (1, 1, cfg.dim), jnp.float32),
        "pos_embedding": gain * jax.random.normal(
            next(keys), (1, cfg.num_patches + 1, cfg.dim), jnp.float32),
        "pre_norm": {"scale": jnp.ones((cfg.dim,), jnp.float32),
                     "bias": jnp.zeros((cfg.dim,), jnp.float32)},
        "blocks": blocks,
    }
    return params


def convert_clip_vision_state_dict(sd, cfg: CLIPVisionConfig,
                                   dtype=jnp.float32,
                                   prefix: str = "visual.") -> Params:
    """Torch VisionTransformer state dict → pytree."""

    def g(name):
        return np.asarray(sd[prefix + name])

    p = cfg.patch_size
    pe = g("patch_embedding.weight")  # [D, 3, p, p]
    params: Params = {
        "patch_embedding": {
            "kernel": jnp.asarray(pe.reshape(cfg.dim, -1).T, dtype)},
        "cls_embedding": jnp.asarray(g("cls_embedding"), jnp.float32),
        "pos_embedding": jnp.asarray(g("pos_embedding"), jnp.float32),
        "pre_norm": {
            "scale": jnp.asarray(g("pre_norm.weight"), jnp.float32),
            "bias": jnp.asarray(g("pre_norm.bias"), jnp.float32)},
    }
    if prefix + "patch_embedding.bias" in sd:
        params["patch_embedding"]["bias"] = jnp.asarray(
            g("patch_embedding.bias"), dtype)

    def stack(fmt, transpose=False, dt=dtype):
        arrs = []
        for i in range(cfg.num_layers):
            a = np.asarray(sd[prefix + fmt.format(i)])
            arrs.append(a.T if transpose else a)
        return jnp.asarray(np.stack(arrs), dt)

    params["blocks"] = {
        "norm1": {"scale": stack("transformer.{}.norm1.weight",
                                 dt=jnp.float32),
                  "bias": stack("transformer.{}.norm1.bias",
                                dt=jnp.float32)},
        "to_qkv": {"kernel": stack("transformer.{}.attn.to_qkv.weight",
                                   transpose=True),
                   "bias": stack("transformer.{}.attn.to_qkv.bias")},
        "proj": {"kernel": stack("transformer.{}.attn.proj.weight",
                                 transpose=True),
                 "bias": stack("transformer.{}.attn.proj.bias")},
        "norm2": {"scale": stack("transformer.{}.norm2.weight",
                                 dt=jnp.float32),
                  "bias": stack("transformer.{}.norm2.bias",
                                dt=jnp.float32)},
        "fc1": {"kernel": stack("transformer.{}.mlp.0.weight",
                                transpose=True),
                "bias": stack("transformer.{}.mlp.0.bias")},
        "fc2": {"kernel": stack("transformer.{}.mlp.2.weight",
                                transpose=True),
                "bias": stack("transformer.{}.mlp.2.bias")},
    }
    return params


def load_clip_checkpoint(path: str, cfg: CLIPVisionConfig =
                         CLIPVisionConfig(), dtype=jnp.float32) -> Params:
    """Load the i2v CLIP checkpoint (.pth) → vision params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_clip_vision_state_dict(sd, cfg, dtype)
