"""Convert WanModel torch/safetensors checkpoints into the stacked JAX
parameter pytree used by ``models/wan_model.py``.

Name map follows the reference module tree (``wan/modules/model.py``):
``blocks.N.self_attn.q.weight`` etc. Per-block tensors are stacked along a
leading layer axis (for ``lax.scan``). Linear weights ``[O, I]`` transpose
to ``[I, O]``; the patch-embed Conv3d ``[D, C, pt, ph, pw]`` flattens to a
``[C·pt·ph·pw, D]`` matmul kernel (patchify uses the same (C, pt, ph, pw)
intra-patch ordering).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..configs import WanModelConfig
from .census import TrackedStateDict

Params = Dict[str, Any]


def _lin(sd, name, dtype, transpose=True, xp=jnp) -> Dict[str, Any]:
    w = np.asarray(sd[f"{name}.weight"])
    p = {"kernel": xp.asarray(w.T if transpose else w, dtype)}
    if f"{name}.bias" in sd:
        p["bias"] = xp.asarray(np.asarray(sd[f"{name}.bias"]), dtype)
    else:
        p["bias"] = xp.zeros((p["kernel"].shape[-1],), dtype)
    return p


def convert_wan_state_dict(sd: Mapping[str, Any], cfg: WanModelConfig,
                           dtype=jnp.bfloat16,
                           as_numpy: bool = False,
                           strict: bool = True) -> Params:
    """``as_numpy=True`` builds the tree host-side (numpy arrays; bf16
    via ml_dtypes) — required when the full-precision tree exceeds device
    HBM and is only a staging step (e.g. quantization of the 28 GB 14B
    tree before upload to a 16 GB chip).

    ``strict=True`` (default) errors if any checkpoint key goes
    unconsumed (renamed/extra keys would otherwise load silently wrong)
    — the converter analog of ``load_state_dict(strict=True)``."""
    tracked = TrackedStateDict(
        sd, f"WanModel[{cfg.model_type}] checkpoint")
    params = _convert_wan(tracked, cfg, dtype, as_numpy)
    if strict:
        tracked.check_all_consumed()
    return params


def _convert_wan(sd: Mapping[str, Any], cfg: WanModelConfig,
                 dtype, as_numpy: bool) -> Params:
    n = cfg.num_layers
    xp = np if as_numpy else jnp

    def _lin_xp(sd_, name, dt, transpose=True):
        return _lin(sd_, name, dt, transpose, xp=xp)

    def stack_lin(fmt, dt=dtype):
        ws, bs = [], []
        for i in range(n):
            p = _lin(sd, fmt.format(i), dt, xp=xp)
            ws.append(p["kernel"])
            bs.append(p["bias"])
        return {"kernel": xp.stack(ws), "bias": xp.stack(bs)}

    def stack_vec(fmt, dt=jnp.float32, reshape=None):
        vs = []
        for i in range(n):
            v = np.asarray(sd[fmt.format(i)])
            if reshape is not None:
                v = v.reshape(reshape)
            vs.append(xp.asarray(v, dt))
        return xp.stack(vs)

    def attn(prefix, img=False):
        p = {
            "q": stack_lin(prefix + ".q"),
            "k": stack_lin(prefix + ".k"),
            "v": stack_lin(prefix + ".v"),
            "o": stack_lin(prefix + ".o"),
        }
        if cfg.qk_norm:
            p["norm_q"] = {"scale": stack_vec(prefix + ".norm_q.weight")}
            p["norm_k"] = {"scale": stack_vec(prefix + ".norm_k.weight")}
        if img:
            p["k_img"] = stack_lin(prefix + ".k_img")
            p["v_img"] = stack_lin(prefix + ".v_img")
            if cfg.qk_norm:
                p["norm_k_img"] = {
                    "scale": stack_vec(prefix + ".norm_k_img.weight")}
        return p

    blocks: Params = {
        "self_attn": attn("blocks.{}.self_attn"),
        "cross_attn": attn("blocks.{}.cross_attn",
                           img=cfg.model_type == "i2v"),
        "ffn": {
            "fc1": stack_lin("blocks.{}.ffn.0"),
            "fc2": stack_lin("blocks.{}.ffn.2"),
        },
        "modulation": stack_vec("blocks.{}.modulation",
                                reshape=(6, cfg.dim)),
    }
    if cfg.cross_attn_norm:
        blocks["norm3"] = {
            "scale": stack_vec("blocks.{}.norm3.weight"),
            "bias": stack_vec("blocks.{}.norm3.bias"),
        }

    pe_w = np.asarray(sd["patch_embedding.weight"])  # [D, C, pt, ph, pw]
    pe_kernel = pe_w.reshape(pe_w.shape[0], -1).T    # [C·pt·ph·pw, D]

    params: Params = {
        "patch_embedding": {
            "kernel": xp.asarray(pe_kernel, dtype),
            "bias": xp.asarray(np.asarray(sd["patch_embedding.bias"]),
                                dtype),
        },
        "text_embedding": {
            "fc1": _lin_xp(sd, "text_embedding.0", dtype),
            "fc2": _lin_xp(sd, "text_embedding.2", dtype),
        },
        # fp32 islands keep fp32 master copies (ref runs these under
        # fp32 autocast, model.py:541-545)
        "time_embedding": {
            "fc1": _lin_xp(sd, "time_embedding.0", jnp.float32),
            "fc2": _lin_xp(sd, "time_embedding.2", jnp.float32),
        },
        "time_projection": {
            "fc": _lin_xp(sd, "time_projection.1", jnp.float32),
        },
        "blocks": blocks,
        "head": {
            "head": _lin_xp(sd, "head.head", jnp.float32),
            "modulation": xp.asarray(
                np.asarray(sd["head.modulation"]).reshape(2, cfg.dim),
                jnp.float32),
        },
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "norm1": {
                "scale": xp.asarray(
                    np.asarray(sd["img_emb.proj.0.weight"]), jnp.float32),
                "bias": xp.asarray(
                    np.asarray(sd["img_emb.proj.0.bias"]), jnp.float32),
            },
            "fc1": _lin_xp(sd, "img_emb.proj.1", dtype),
            "fc2": _lin_xp(sd, "img_emb.proj.3", dtype),
            "norm2": {
                "scale": xp.asarray(
                    np.asarray(sd["img_emb.proj.4.weight"]), jnp.float32),
                "bias": xp.asarray(
                    np.asarray(sd["img_emb.proj.4.bias"]), jnp.float32),
            },
        }
    return params


def expected_wan_keys(cfg: WanModelConfig) -> set:
    """The exact checkpoint key set ``convert_wan_state_dict`` consumes
    for ``cfg`` — by construction the key census of the reference
    ``WanModel`` (wan/modules/model.py:361-484; verified against a
    meta-device instantiation of the full 14B module in
    tests/test_key_census.py)."""
    keys = set()

    def lin(name):
        keys.add(f"{name}.weight")
        keys.add(f"{name}.bias")

    lin("patch_embedding")
    lin("text_embedding.0")
    lin("text_embedding.2")
    lin("time_embedding.0")
    lin("time_embedding.2")
    lin("time_projection.1")
    lin("head.head")
    keys.add("head.modulation")
    for i in range(cfg.num_layers):
        for attn, img in (("self_attn", False),
                          ("cross_attn", cfg.model_type == "i2v")):
            for p in ("q", "k", "v", "o"):
                lin(f"blocks.{i}.{attn}.{p}")
            if cfg.qk_norm:
                keys.add(f"blocks.{i}.{attn}.norm_q.weight")
                keys.add(f"blocks.{i}.{attn}.norm_k.weight")
            if img:
                lin(f"blocks.{i}.{attn}.k_img")
                lin(f"blocks.{i}.{attn}.v_img")
                if cfg.qk_norm:
                    keys.add(f"blocks.{i}.{attn}.norm_k_img.weight")
        lin(f"blocks.{i}.ffn.0")
        lin(f"blocks.{i}.ffn.2")
        keys.add(f"blocks.{i}.modulation")
        if cfg.cross_attn_norm:
            keys.add(f"blocks.{i}.norm3.weight")
            keys.add(f"blocks.{i}.norm3.bias")
    if cfg.model_type == "i2v":
        for name in ("img_emb.proj.0", "img_emb.proj.1",
                     "img_emb.proj.3", "img_emb.proj.4"):
            lin(name)
    return keys


def load_wan_checkpoint(ckpt_dir: str, cfg: WanModelConfig,
                        dtype=jnp.bfloat16,
                        as_numpy: bool = False,
                        strict: bool = True) -> Params:
    """Load diffusers-layout safetensors shards from ``ckpt_dir``
    (``diffusion_pytorch_model*.safetensors``) → pytree.

    Mirrors ``WanModel.from_pretrained`` loading (the diffusers ModelMixin
    path, ref wan/text2video.py:87) without the diffusers dependency.
    """
    from safetensors import safe_open

    shards = sorted(
        f for f in os.listdir(ckpt_dir)
        if f.startswith("diffusion_pytorch_model") and
        f.endswith(".safetensors"))
    if not shards:
        raise FileNotFoundError(
            f"no diffusion_pytorch_model*.safetensors in {ckpt_dir}")
    sd: Dict[str, np.ndarray] = {}
    for fname in shards:
        # torch framework: bf16 tensors aren't representable in numpy
        with safe_open(os.path.join(ckpt_dir, fname), framework="pt") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k).float().numpy()
    return convert_wan_state_dict(sd, cfg, dtype, as_numpy, strict=strict)
