"""Convert Wan2.1 VAE torch checkpoints (``Wan2.1_VAE.pth`` state dict)
into the JAX parameter pytree used by ``models/vae.py``.

Name map follows the reference module tree (``wan/modules/vae.py``):
``encoder.downsamples.N`` / ``decoder.upsamples.N`` flat Sequential
indices are unflattened into per-stage lists. Layout transforms:
Conv3d ``[O,I,kt,kh,kw]`` → ``[kt,kh,kw,I,O]``; Conv2d ``[O,I,kh,kw]`` →
``[kh,kw,I,O]``; RMS_norm gammas squeeze to ``[C]``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..configs import VAEConfig

Array = Any


def _conv3(sd, name, dtype) -> Dict[str, Array]:
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 4, 1, 0), dtype),
            "bias": jnp.asarray(b, dtype)}


def _conv2(sd, name, dtype) -> Dict[str, Array]:
    w = np.asarray(sd[f"{name}.weight"])
    b = np.asarray(sd[f"{name}.bias"])
    return {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(b, dtype)}


def _gamma(sd, name) -> Dict[str, Array]:
    g = np.asarray(sd[f"{name}.gamma"]).reshape(-1)
    return {"gamma": jnp.asarray(g, jnp.float32)}


def _res(sd, name, dtype, has_shortcut) -> Dict[str, Array]:
    p = {
        "norm1": _gamma(sd, f"{name}.residual.0"),
        "conv1": _conv3(sd, f"{name}.residual.2", dtype),
        "norm2": _gamma(sd, f"{name}.residual.3"),
        "conv2": _conv3(sd, f"{name}.residual.6", dtype),
    }
    if has_shortcut:
        p["shortcut"] = _conv3(sd, f"{name}.shortcut", dtype)
    return p


def _attn(sd, name, dtype) -> Dict[str, Array]:
    return {
        "norm": _gamma(sd, f"{name}.norm"),
        "to_qkv": _conv2(sd, f"{name}.to_qkv", dtype),
        "proj": _conv2(sd, f"{name}.proj", dtype),
    }


def expected_vae_keys(cfg: VAEConfig) -> set:
    """Key census of the reference ``WanVAE_`` state dict
    (wan/modules/vae.py:483-616) — exactly what
    ``convert_vae_state_dict`` consumes."""
    keys = set()

    def conv(name):
        keys.add(f"{name}.weight")
        keys.add(f"{name}.bias")

    def gamma(name):
        keys.add(f"{name}.gamma")

    def res(name, has_shortcut):
        gamma(f"{name}.residual.0")
        conv(f"{name}.residual.2")
        gamma(f"{name}.residual.3")
        conv(f"{name}.residual.6")
        if has_shortcut:
            conv(f"{name}.shortcut")

    def attn(name):
        gamma(f"{name}.norm")
        conv(f"{name}.to_qkv")
        conv(f"{name}.proj")

    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    conv("encoder.conv1")
    idx = 0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        c = cin
        for _ in range(cfg.num_res_blocks):
            res(f"encoder.downsamples.{idx}", c != cout)
            c = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            conv(f"encoder.downsamples.{idx}.resample.1")
            if cfg.temporal_downsample[i]:
                conv(f"encoder.downsamples.{idx}.time_conv")
            idx += 1
    res("encoder.middle.0", False)
    attn("encoder.middle.1")
    res("encoder.middle.2", False)
    gamma("encoder.head.0")
    conv("encoder.head.2")

    ddims = [cfg.dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    conv("decoder.conv1")
    res("decoder.middle.0", False)
    attn("decoder.middle.1")
    res("decoder.middle.2", False)
    idx = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            res(f"decoder.upsamples.{idx}", c != cout)
            c = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            conv(f"decoder.upsamples.{idx}.resample.1")
            if temporal_upsample[i]:
                conv(f"decoder.upsamples.{idx}.time_conv")
            idx += 1
    gamma("decoder.head.0")
    conv("decoder.head.2")
    conv("conv1")
    conv("conv2")
    return keys


def convert_vae_state_dict(sd: Mapping[str, Any], cfg: VAEConfig,
                           dtype=jnp.float32,
                           strict: bool = True) -> Dict[str, Any]:
    """state dict (tensor-like values convertible via np.asarray) → pytree.
    ``strict`` errors on unconsumed checkpoint keys (census.py)."""
    from .census import TrackedStateDict

    sd = TrackedStateDict(sd, "WanVAE checkpoint")
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

    # ---------------- encoder
    enc: Dict[str, Any] = {"conv1": _conv3(sd, "encoder.conv1", dtype)}
    down = []
    idx = 0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        stage: Dict[str, Any] = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(
                _res(sd, f"encoder.downsamples.{idx}", dtype, c != cout))
            c = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            name = f"encoder.downsamples.{idx}"
            ds = {"conv": _conv2(sd, f"{name}.resample.1", dtype)}
            if cfg.temporal_downsample[i]:
                ds["time_conv"] = _conv3(sd, f"{name}.time_conv", dtype)
            stage["downsample"] = ds
            idx += 1
        down.append(stage)
    out_dim = dims[-1]
    enc.update(
        down=down,
        mid_res1=_res(sd, "encoder.middle.0", dtype, False),
        mid_attn=_attn(sd, "encoder.middle.1", dtype),
        mid_res2=_res(sd, "encoder.middle.2", dtype, False),
        head_norm=_gamma(sd, "encoder.head.0"),
        head_conv=_conv3(sd, "encoder.head.2", dtype),
    )

    # ---------------- decoder
    ddims = [cfg.dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    dec: Dict[str, Any] = {
        "conv1": _conv3(sd, "decoder.conv1", dtype),
        "mid_res1": _res(sd, "decoder.middle.0", dtype, False),
        "mid_attn": _attn(sd, "decoder.middle.1", dtype),
        "mid_res2": _res(sd, "decoder.middle.2", dtype, False),
    }
    up = []
    idx = 0
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2
        stage = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(
                _res(sd, f"decoder.upsamples.{idx}", dtype, c != cout))
            c = cout
            idx += 1
        if i != len(cfg.dim_mult) - 1:
            name = f"decoder.upsamples.{idx}"
            us = {"conv": _conv2(sd, f"{name}.resample.1", dtype)}
            if temporal_upsample[i]:
                us["time_conv"] = _conv3(sd, f"{name}.time_conv", dtype)
            stage["upsample"] = us
            idx += 1
        up.append(stage)
    dec.update(
        up=up,
        head_norm=_gamma(sd, "decoder.head.0"),
        head_conv=_conv3(sd, "decoder.head.2", dtype),
    )

    params = {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv3(sd, "conv1", dtype),
        "conv2": _conv3(sd, "conv2", dtype),
    }
    if strict:
        sd.check_all_consumed()
    return params


def load_vae_checkpoint(path: str, cfg: VAEConfig,
                        dtype=jnp.float32,
                        strict: bool = True) -> Dict[str, Any]:
    """Load ``Wan2.1_VAE.pth`` (torch pickle) → pytree. Requires torch."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.float().numpy() for k, v in sd.items()}
    return convert_vae_state_dict(sd, cfg, dtype, strict=strict)
