"""Checkpoint save/restore (orbax) + reference-compatible export.

Parity targets: FastVideo ``save_checkpoint``/``resume_lora_optimizer``
(``finetune.py:494-506, 402-404, 658-661``) and the reference layout
convention ``<output_dir>/checkpoint-step_N/`` scanned by the validation
watcher (``valid_training.py:302-313``).

TPU-native: orbax handles sharded arrays natively (each host writes its
shards — the multi-host story the reference lacks); an optional
safetensors export writes ``diffusion_pytorch_model.safetensors`` with
the reference's diffusers key names so checkpoints interoperate both
ways (the same name map as ``models/wan_convert.py``, inverted).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax

CKPT_RE = re.compile(r"checkpoint-step_(\d+)$")


def checkpoint_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-step_{step}")


def latest_checkpoint(output_dir: str) -> Optional[Tuple[str, int]]:
    """Newest checkpoint-step_N under output_dir (ref
    valid_training.py:301-313)."""
    best = None
    if not os.path.isdir(output_dir):
        return None
    for name in os.listdir(output_dir):
        m = CKPT_RE.match(name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[1]:
                best = (os.path.join(output_dir, name), step)
    return best


def save_checkpoint(output_dir: str, step: int, params: Dict[str, Any],
                    opt_state: Any = None,
                    extra_meta: Optional[Dict[str, Any]] = None,
                    export_safetensors: bool = False,
                    cfg=None) -> str:
    import orbax.checkpoint as ocp

    path = checkpoint_dir(output_dir, step)
    os.makedirs(path, exist_ok=True)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "params"), params, force=True)
    if opt_state is not None:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    ckptr.wait_until_finished()

    meta = {"step": step}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)

    if export_safetensors and cfg is not None:
        export_wan_safetensors(
            os.path.join(path, "diffusion_pytorch_model.safetensors"),
            params, cfg)
    return path


def restore_checkpoint(path: str, params_like: Dict[str, Any],
                       opt_state_like: Any = None):
    """Restore (params, opt_state, step) from a checkpoint dir, using
    templates for structure/sharding."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, "params"), params_like)
    opt_state = None
    if opt_state_like is not None and \
            os.path.isdir(os.path.join(path, "opt_state")):
        opt_state = ckptr.restore(os.path.join(path, "opt_state"),
                                  opt_state_like)
    step = 0
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            step = json.load(f).get("step", 0)
    return params, opt_state, step


# --------------------------------------------------------------------------
# safetensors export (inverse of models/wan_convert.py)
# --------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    return np.asarray(jax.device_get(x), np.float32)


def wan_params_to_state_dict(params: Dict[str, Any], cfg) -> Dict[str, np.ndarray]:
    """Stacked pytree → diffusers/reference key names (torch layouts)."""
    sd: Dict[str, np.ndarray] = {}

    pe = _np(params["patch_embedding"]["kernel"])  # [C·pt·ph·pw, D]
    pt, ph, pw = cfg.patch_size
    sd["patch_embedding.weight"] = pe.T.reshape(
        cfg.dim, cfg.in_dim, pt, ph, pw)
    sd["patch_embedding.bias"] = _np(params["patch_embedding"]["bias"])

    def lin(dst, p):
        sd[f"{dst}.weight"] = _np(p["kernel"]).T
        sd[f"{dst}.bias"] = _np(p["bias"])

    lin("text_embedding.0", params["text_embedding"]["fc1"])
    lin("text_embedding.2", params["text_embedding"]["fc2"])
    lin("time_embedding.0", params["time_embedding"]["fc1"])
    lin("time_embedding.2", params["time_embedding"]["fc2"])
    lin("time_projection.1", params["time_projection"]["fc"])
    lin("head.head", params["head"]["head"])
    sd["head.modulation"] = _np(params["head"]["modulation"])[None]

    blocks = params["blocks"]
    n = _np(blocks["modulation"]).shape[0]
    for i in range(n):
        pre = f"blocks.{i}"
        sd[f"{pre}.modulation"] = _np(blocks["modulation"])[i][None]
        if "norm3" in blocks:
            sd[f"{pre}.norm3.weight"] = _np(blocks["norm3"]["scale"])[i]
            sd[f"{pre}.norm3.bias"] = _np(blocks["norm3"]["bias"])[i]
        for attn in ("self_attn", "cross_attn"):
            bp = blocks[attn]
            for proj in ("q", "k", "v", "o"):
                sd[f"{pre}.{attn}.{proj}.weight"] = \
                    _np(bp[proj]["kernel"])[i].T
                sd[f"{pre}.{attn}.{proj}.bias"] = _np(bp[proj]["bias"])[i]
            if "norm_q" in bp:
                sd[f"{pre}.{attn}.norm_q.weight"] = \
                    _np(bp["norm_q"]["scale"])[i]
                sd[f"{pre}.{attn}.norm_k.weight"] = \
                    _np(bp["norm_k"]["scale"])[i]
            if "k_img" in bp:
                sd[f"{pre}.{attn}.k_img.weight"] = \
                    _np(bp["k_img"]["kernel"])[i].T
                sd[f"{pre}.{attn}.k_img.bias"] = _np(bp["k_img"]["bias"])[i]
                sd[f"{pre}.{attn}.v_img.weight"] = \
                    _np(bp["v_img"]["kernel"])[i].T
                sd[f"{pre}.{attn}.v_img.bias"] = _np(bp["v_img"]["bias"])[i]
                if "norm_k_img" in bp:
                    sd[f"{pre}.{attn}.norm_k_img.weight"] = \
                        _np(bp["norm_k_img"]["scale"])[i]
        sd[f"{pre}.ffn.0.weight"] = _np(blocks["ffn"]["fc1"]["kernel"])[i].T
        sd[f"{pre}.ffn.0.bias"] = _np(blocks["ffn"]["fc1"]["bias"])[i]
        sd[f"{pre}.ffn.2.weight"] = _np(blocks["ffn"]["fc2"]["kernel"])[i].T
        sd[f"{pre}.ffn.2.bias"] = _np(blocks["ffn"]["fc2"]["bias"])[i]
    return sd


def export_wan_safetensors(path: str, params: Dict[str, Any], cfg) -> None:
    from safetensors.numpy import save_file

    sd = wan_params_to_state_dict(params, cfg)
    save_file(sd, path)


# --------------------------------------------------------------------------
# LoRA adapter export/import (peft-style safetensors)
# --------------------------------------------------------------------------


def lora_to_peft_state_dict(lora: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Stacked LoRA A/B tree → peft-layout torch state dict.

    Parity surface: the reference saves adapters via FastVideo's
    ``save_lora_checkpoint`` (finetune.py:501-502), which serializes the
    peft-wrapped transformer's ``lora_A``/``lora_B`` Linear weights.
    peft stores ``lora_A.weight`` as ``[r, d_in]`` and ``lora_B.weight``
    as ``[d_out, r]`` (torch Linear layout) under the base module's key
    path — here the same diffusers key names as
    ``wan_params_to_state_dict`` (``blocks.{i}.self_attn.q`` ...)."""
    sd: Dict[str, np.ndarray] = {}
    for base, ab in lora.items():
        # base: 'blocks/self_attn/q' on the stacked layout
        parts = base.split("/")
        a = _np(ab["A"])   # [L, d_in, r]
        b = _np(ab["B"])   # [L, r, d_out]
        for i in range(a.shape[0]):
            key = f"{parts[0]}.{i}." + ".".join(parts[1:])
            sd[f"{key}.lora_A.weight"] = a[i].T
            sd[f"{key}.lora_B.weight"] = b[i].T
    return sd


def lora_from_peft_state_dict(sd: Dict[str, np.ndarray],
                              dtype=np.float32) -> Dict[str, Any]:
    """Inverse of ``lora_to_peft_state_dict``: peft keys → stacked tree."""
    import collections

    per_base = collections.defaultdict(dict)
    for key, val in sd.items():
        m = re.match(r"blocks\.(\d+)\.(.+)\.lora_([AB])\.weight$", key)
        if not m:
            continue
        layer, mid, which = int(m.group(1)), m.group(2), m.group(3)
        base = "blocks/" + mid.replace(".", "/")
        per_base[base].setdefault(which, {})[layer] = np.asarray(val, dtype)
    lora: Dict[str, Any] = {}
    for base, ab in per_base.items():
        layers = sorted(ab["A"])
        lora[base] = {
            "A": np.stack([ab["A"][i].T for i in layers]),
            "B": np.stack([ab["B"][i].T for i in layers]),
        }
    return lora


def export_lora_safetensors(path: str, lora: Dict[str, Any],
                            alpha: float, rank: int) -> None:
    """Write the adapters as peft-layout safetensors + an
    adapter_config.json carrying alpha/rank (what peft needs to apply
    the ``alpha/rank`` scale on load)."""
    from safetensors.numpy import save_file

    save_file(lora_to_peft_state_dict(lora), path)
    cfg_path = os.path.join(os.path.dirname(path), "adapter_config.json")
    with open(cfg_path, "w") as f:
        json.dump({"lora_alpha": alpha, "r": rank,
                   "peft_type": "LORA",
                   "target_modules": sorted(
                       {k.split("/", 1)[1] for k in lora})}, f)
