"""Wan 3D causal VAE — TPU-native JAX implementation.

Parity target: ``wan/modules/vae.py`` (WanVAE / WanVAE_ / Encoder3d /
Decoder3d). 8×8 spatial, 4× temporal compression; z_dim 16, base dim 96;
causal Conv3d throughout.

TPU-native design:

- **Channels-last NDHWC layout** internally (XLA:TPU's native conv layout);
  the public interface keeps the reference's ``[B, C, T, H, W]``.
- **Full-tensor temporal ops instead of mutable chunk caches.** The
  reference can only encode/decode through its chunked streaming path with
  per-conv feature caches (the cache-less branch skips the temporal
  up/downsample conv entirely — vae.py:101-160). The streaming semantics
  have exact full-tensor equivalents, implemented here:

  * stride-1 CausalConv3d  ≡  conv with 2·pad left zero padding in time;
  * downsample3d time conv (vae.py:143-159): the first frame bypasses
    (the first chunk is cached without convolution), subsequent frames go
    through the unpadded stride-2 conv whose windows start at frame 1 —
    ``concat([x[:, :1], strided_conv(x)])``;
  * upsample3d time conv (vae.py:103-137): the first frame bypasses
    ('Rep' marker chunk), frames 2… go through a causal conv whose stream
    starts with two zero frames, each output frame splitting its 2C
    channels into two consecutive output frames.

  Equivalence with the reference's streaming loop is covered by a direct
  numerical test against ``/root/reference/wan/modules/vae.py`` (importable
  standalone) on random weights.
- A ``lax.scan`` streaming mode with explicit conv-cache carries (for
  memory-bounded long-video decode) lives in ``vae_streaming.py``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VAEConfig

Params = Dict[str, Any]

# hard-coded published latent normalization (ref vae.py:629-639)
LATENT_MEAN = (
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
)
LATENT_STD = (
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
)


# --------------------------------------------------------------------------
# primitive ops (NDHWC)
# --------------------------------------------------------------------------


def causal_conv3d(p: Params, x: jnp.ndarray,
                  stride: Tuple[int, int, int] = (1, 1, 1),
                  time_pad: Optional[int] = None,
                  space_pad: int = None) -> jnp.ndarray:
    """Causal 3D conv: left-only zero padding in time (2·pad frames),
    symmetric in space (ref CausalConv3d, vae.py:17-36).

    p['kernel']: [kt, kh, kw, I, O]; x: [B, T, H, W, C].
    """
    kt, kh, kw = p["kernel"].shape[:3]
    if time_pad is None:
        time_pad = 2 * ((kt - 1) // 2)
    if space_pad is None:
        space_pad = (kh - 1) // 2
    dn = jax.lax.conv_dimension_numbers(
        x.shape, p["kernel"].shape, ("NDHWC", "DHWIO", "NDHWC"))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=[(time_pad, 0), (space_pad, space_pad),
                 (space_pad, space_pad)],
        dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + p["bias"].astype(x.dtype)


def conv2d(p: Params, x: jnp.ndarray, stride: int = 1,
           padding="SAME") -> jnp.ndarray:
    """Per-frame 2D conv: x [B, T, H, W, C], kernel [kh, kw, I, O]."""
    b, t, h, w, c = x.shape
    xf = x.reshape(b * t, h, w, c)
    dn = jax.lax.conv_dimension_numbers(
        xf.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        xf, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    out = out + p["bias"].astype(x.dtype)
    return out.reshape(b, t, *out.shape[1:])


def vae_rms_norm(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """RMS_norm (ref vae.py:39-54): F.normalize over channels ×
    sqrt(C) × gamma. Channels-last here."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    normed = xf / jnp.maximum(norm, 1e-12)
    out = normed * math.sqrt(c) * p["gamma"].astype(jnp.float32)
    return out.astype(x.dtype)


def _silu(x):
    return jax.nn.silu(x)


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------


def residual_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ref ResidualBlock (vae.py:186-220)."""
    h = x
    if "shortcut" in p:
        h = causal_conv3d(p["shortcut"], x)
    y = vae_rms_norm(p["norm1"], x)
    y = causal_conv3d(p["conv1"], _silu(y))
    y = vae_rms_norm(p["norm2"], y)
    y = causal_conv3d(p["conv2"], _silu(y))
    return y + h


def attention_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Single-head per-frame spatial attention (ref vae.py:223-262)."""
    b, t, h, w, c = x.shape
    y = vae_rms_norm(p["norm"], x)
    qkv = conv2d(p["to_qkv"], y)  # [B, T, H, W, 3C]
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 3 * c), 3, axis=-1)
    logits = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    probs = jax.nn.softmax(logits * (c ** -0.5), axis=-1).astype(v.dtype)
    out = jnp.einsum("bij,bjc->bic", probs, v,
                     precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(b, t, h, w, c)
    return conv2d(p["proj"], out) + x


def _spatial_down(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ZeroPad2d((0,1,0,1)) + stride-2 3×3 conv (ref vae.py:87-94)."""
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    xf = xp.reshape(b * t, h + 1, w + 1, c)
    dn = jax.lax.conv_dimension_numbers(
        xf.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        xf, p["kernel"].astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=dn, precision=jax.lax.Precision.HIGHEST)
    out = out + p["bias"].astype(x.dtype)
    return out.reshape(b, t, *out.shape[1:])


def _spatial_up(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """2× nearest-exact upsample + 3×3 conv C→C/2 (ref vae.py:76-83)."""
    b, t, h, w, c = x.shape
    up = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    return conv2d(p["conv"], up)


def downsample3d_time(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Temporal stride-2 conv with first-frame bypass — full-tensor
    equivalent of the streaming cache path (ref vae.py:143-159)."""
    first = x[:, :1]
    rest = causal_conv3d(p, x, stride=(2, 1, 1), time_pad=0, space_pad=0)
    return jnp.concatenate([first, rest], axis=1)


def upsample3d_time(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Temporal 2× via channel-doubling causal conv with first-frame
    bypass — full-tensor equivalent of the 'Rep' streaming path
    (ref vae.py:103-137)."""
    b, t, h, w, c = x.shape
    first = x[:, :1]
    if t == 1:
        return first
    rest_in = x[:, 1:]
    # causal stream starts with two zero frames (the 'Rep' lead-in)
    y = causal_conv3d(p, rest_in, time_pad=2, space_pad=0)  # [B,T-1,H,W,2C]
    y = y.reshape(b, t - 1, h, w, 2, c)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), h, w, c)
    return jnp.concatenate([first, y], axis=1)


# --------------------------------------------------------------------------
# encoder / decoder
# --------------------------------------------------------------------------


def encoder(p: Params, x: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Encoder3d (ref vae.py:265-366). x: [B, T, H, W, 3] → latents
    [B, T', H/8, W/8, 2·z]."""
    h = causal_conv3d(p["conv1"], x)
    for stage in p["down"]:
        for rb in stage["res"]:
            h = residual_block(rb, h)
        if "downsample" in stage:
            ds = stage["downsample"]
            h = _spatial_down(ds["conv"], h)
            if "time_conv" in ds:
                h = downsample3d_time(ds["time_conv"], h)
    h = residual_block(p["mid_res1"], h)
    h = attention_block(p["mid_attn"], h)
    h = residual_block(p["mid_res2"], h)
    h = vae_rms_norm(p["head_norm"], h)
    h = causal_conv3d(p["head_conv"], _silu(h))
    return h


def decoder(p: Params, z: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Decoder3d (ref vae.py:369-472). z: [B, T', H', W', z] →
    [B, T, 8H', 8W', 3]."""
    h = causal_conv3d(p["conv1"], z)
    h = residual_block(p["mid_res1"], h)
    h = attention_block(p["mid_attn"], h)
    h = residual_block(p["mid_res2"], h)
    for stage in p["up"]:
        for rb in stage["res"]:
            h = residual_block(rb, h)
        if "upsample" in stage:
            us = stage["upsample"]
            if "time_conv" in us:
                h = upsample3d_time(us["time_conv"], h)
            h = _spatial_up(us, h)
    h = vae_rms_norm(p["head_norm"], h)
    h = causal_conv3d(p["head_conv"], _silu(h))
    return h


# --------------------------------------------------------------------------
# facade (scale-normalized encode/decode, ref WanVAE vae.py:619-663)
# --------------------------------------------------------------------------


def encode(params: Params, video: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """[B, 3, T, H, W] in [-1,1] → normalized latent [B, z, T', H/8, W/8].

    Deterministic (returns the normalized posterior mean, matching
    WanVAE_.encode, vae.py:516-542).
    """
    x = video.transpose(0, 2, 3, 4, 1)  # → NDHWC
    h = encoder(params["encoder"], x, cfg)
    h = causal_conv3d(params["conv1"], h)  # 1×1×1 (z·2 → z·2)
    mu = h[..., : cfg.z_dim]
    mean = jnp.asarray(LATENT_MEAN[:cfg.z_dim], mu.dtype)
    inv_std = 1.0 / jnp.asarray(LATENT_STD[:cfg.z_dim], mu.dtype)
    mu = (mu - mean) * inv_std
    return mu.transpose(0, 4, 1, 2, 3)  # → NC T H W


def decode(params: Params, z: jnp.ndarray, cfg: VAEConfig) -> jnp.ndarray:
    """Normalized latent [B, z, T', H', W'] → video [B, 3, T, 8H', 8W'],
    clamped to [-1, 1] (ref vae.py:657-663)."""
    zl = z.transpose(0, 2, 3, 4, 1)
    mean = jnp.asarray(LATENT_MEAN[:cfg.z_dim], zl.dtype)
    std = jnp.asarray(LATENT_STD[:cfg.z_dim], zl.dtype)
    zl = zl * std + mean
    zl = causal_conv3d(params["conv2"], zl)  # 1×1×1 (z → z)
    x = decoder(params["decoder"], zl, cfg)
    x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 4, 1, 2, 3)


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------


def _conv_init(key, kt, kh, kw, cin, cout, dtype):
    k1, _ = jax.random.split(key)
    fan_in = kt * kh * kw * cin
    std = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(
            k1, (kt, kh, kw, cin, cout), dtype, -std, std),
        "bias": jnp.zeros((cout,), dtype),
    }


def _conv2d_init(key, kh, kw, cin, cout, dtype):
    p = _conv_init(key, 1, kh, kw, cin, cout, dtype)
    return {"kernel": p["kernel"][0], "bias": p["bias"]}


def _res_init(key, cin, cout, dtype):
    ks = iter(jax.random.split(key, 4))
    p = {
        "norm1": {"gamma": jnp.ones((cin,), jnp.float32)},
        "conv1": _conv_init(next(ks), 3, 3, 3, cin, cout, dtype),
        "norm2": {"gamma": jnp.ones((cout,), jnp.float32)},
        "conv2": _conv_init(next(ks), 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(next(ks), 1, 1, 1, cin, cout, dtype)
    return p


def _attn_init(key, c, dtype):
    ks = iter(jax.random.split(key, 2))
    return {
        "norm": {"gamma": jnp.ones((c,), jnp.float32)},
        "to_qkv": _conv2d_init(next(ks), 1, 1, c, 3 * c, dtype),
        # zero-init proj (ref vae.py:238)
        "proj": {"kernel": jnp.zeros((1, 1, c, c), dtype),
                 "bias": jnp.zeros((c,), dtype)},
    }


def init_params(key: jax.Array, cfg: VAEConfig,
                dtype=jnp.float32) -> Params:
    """Random init with the reference's module tree shape."""
    keys = iter(jax.random.split(key, 256))
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

    # ---- encoder
    enc: Params = {"conv1": _conv_init(next(keys), 3, 3, 3, 3, dims[0], dtype)}
    down = []
    scale = 1.0
    for i, (cin, cout) in enumerate(zip(dims[:-1], dims[1:])):
        stage: Params = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks):
            stage["res"].append(_res_init(next(keys), c, cout, dtype))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            ds = {"conv": _conv2d_init(next(keys), 3, 3, cout, cout, dtype)}
            if cfg.temporal_downsample[i]:
                ds["time_conv"] = _conv_init(
                    next(keys), 3, 1, 1, cout, cout, dtype)
            stage["downsample"] = ds
            scale /= 2
        down.append(stage)
    out_dim = dims[-1]
    enc.update(
        down=down,
        mid_res1=_res_init(next(keys), out_dim, out_dim, dtype),
        mid_attn=_attn_init(next(keys), out_dim, dtype),
        mid_res2=_res_init(next(keys), out_dim, out_dim, dtype),
        head_norm={"gamma": jnp.ones((out_dim,), jnp.float32)},
        head_conv=_conv_init(next(keys), 3, 3, 3, out_dim, 2 * cfg.z_dim,
                             dtype),
    )

    # ---- decoder
    ddims = [cfg.dim * u for u in
             (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    temporal_upsample = tuple(reversed(cfg.temporal_downsample))
    dec: Params = {
        "conv1": _conv_init(next(keys), 3, 3, 3, cfg.z_dim, ddims[0], dtype),
        "mid_res1": _res_init(next(keys), ddims[0], ddims[0], dtype),
        "mid_attn": _attn_init(next(keys), ddims[0], dtype),
        "mid_res2": _res_init(next(keys), ddims[0], ddims[0], dtype),
    }
    up = []
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            cin = cin // 2  # previous upsample halved channels (vae.py:403-404)
        stage = {"res": []}
        c = cin
        for _ in range(cfg.num_res_blocks + 1):
            stage["res"].append(_res_init(next(keys), c, cout, dtype))
            c = cout
        if i != len(cfg.dim_mult) - 1:
            us = {"conv": _conv2d_init(next(keys), 3, 3, cout, cout // 2,
                                       dtype)}
            if temporal_upsample[i]:
                us["time_conv"] = _conv_init(
                    next(keys), 3, 1, 1, cout, cout * 2, dtype)
            stage["upsample"] = us
        up.append(stage)
    dec.update(
        up=up,
        head_norm={"gamma": jnp.ones((ddims[-1],), jnp.float32)},
        head_conv=_conv_init(next(keys), 3, 3, 3, ddims[-1], 3, dtype),
    )

    return {
        "encoder": enc,
        "decoder": dec,
        "conv1": _conv_init(next(keys), 1, 1, 1, 2 * cfg.z_dim,
                            2 * cfg.z_dim, dtype),
        "conv2": _conv_init(next(keys), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
    }
