"""Memory-bounded streaming VAE encode/decode.

The full-tensor VAE (``models/vae.py``) materializes decoder activations
for the whole clip — ~12 GB fp32 at 480p×81f, far more at 1080p. The
reference bounds memory by streaming temporal chunks through per-conv
feature caches (``WanVAE_.encode/decode``, vae.py:516-568). Here that
becomes a ``lax.scan`` with the caches as an explicit typed carry
(SURVEY §7.3 'VAE causal cache as scan state'):

- encode: chunks of 1, 4, 4, … input frames (vae.py:519-534);
- decode: one latent frame per step (vae.py:552-566);
- the first chunk runs separately (its cache state doesn't exist yet and
  its output frame count differs); steps 2… are a uniform scanned body.

Cache semantics (derived in vae.py's full-tensor analysis):
- stride-1 causal k3 conv: carry the last 2 *input* frames at that layer
  (zeros before the first chunk);
- encoder downsample3d time conv: carry the last 1 input frame; the first
  chunk bypasses the conv entirely;
- decoder upsample3d time conv: carry the last 2 input frames initialized
  to zeros (the 'Rep' lead-in); the first chunk bypasses.

Numerical equality with the full-tensor implementation (and therefore
with the reference's streaming loop) is unit-tested.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import VAEConfig
from .vae import (
    LATENT_MEAN, LATENT_STD, _silu, _spatial_down, _spatial_up,
    attention_block, causal_conv3d, vae_rms_norm)

Params = Dict[str, Any]


class _CacheIO:
    """Sequential cache reader/writer walked in layer order (the explicit
    analog of the reference's feat_cache list + feat_idx counter)."""

    def __init__(self, caches: Optional[List[jnp.ndarray]]):
        self.in_caches = caches
        self.out: List[jnp.ndarray] = []
        self.i = 0

    def next(self, zero_shape, dtype) -> jnp.ndarray:
        if self.in_caches is None:
            c = jnp.zeros(zero_shape, dtype)
        else:
            c = self.in_caches[self.i]
        self.i += 1
        return c

    def put(self, c: jnp.ndarray) -> None:
        self.out.append(c)


def _sconv(p: Params, x: jnp.ndarray, io: _CacheIO) -> jnp.ndarray:
    """Streaming stride-1 causal conv: prepend the 2-frame cache, VALID
    time padding, update cache with the last 2 input frames."""
    kt = p["kernel"].shape[0]
    if kt == 1:
        return causal_conv3d(p, x)
    b, t, h, w, c = x.shape
    cache = io.next((b, 2, h, w, c), x.dtype)
    inp = jnp.concatenate([cache, x], axis=1)
    out = causal_conv3d(p, inp, time_pad=0)
    io.put(inp[:, -2:])
    return out


def _sres(p: Params, x: jnp.ndarray, io: _CacheIO) -> jnp.ndarray:
    h = x
    if "shortcut" in p:
        h = causal_conv3d(p["shortcut"], x)
    y = vae_rms_norm(p["norm1"], x)
    y = _sconv(p["conv1"], _silu(y), io)
    y = vae_rms_norm(p["norm2"], y)
    y = _sconv(p["conv2"], _silu(y), io)
    return y + h


def _sdown3d_time(p: Params, x: jnp.ndarray, io: _CacheIO,
                  first: bool) -> jnp.ndarray:
    b, t, h, w, c = x.shape
    if first:
        # first chunk bypasses the conv; cache its last frame
        io.put(x[:, -1:])
        return x
    cache = io.next(None, x.dtype)
    inp = jnp.concatenate([cache, x], axis=1)
    out = causal_conv3d(p, inp, stride=(2, 1, 1), time_pad=0, space_pad=0)
    io.put(inp[:, -1:])
    return out


def _sup3d_time(p: Params, x: jnp.ndarray, io: _CacheIO,
                first: bool) -> jnp.ndarray:
    b, t, h, w, c = x.shape
    if first:
        io.put(jnp.zeros((b, 2, h, w, c), x.dtype))  # 'Rep' zero lead-in
        return x
    cache = io.next(None, x.dtype)
    inp = jnp.concatenate([cache, x], axis=1)
    y = causal_conv3d(p, inp, time_pad=0, space_pad=0)  # [B, t, H, W, 2C]
    io.put(inp[:, -2:])
    y = y.reshape(b, t, h, w, 2, c)
    y = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * t, h, w, c)
    return y


# --------------------------------------------------------------------------
# encoder / decoder chunk bodies
# --------------------------------------------------------------------------


def _encoder_chunk(p: Params, x: jnp.ndarray, cfg: VAEConfig,
                   caches, first: bool):
    io = _CacheIO(None if first else caches)
    h = _sconv(p["conv1"], x, io)
    for si, stage in enumerate(p["down"]):
        for rb in stage["res"]:
            h = _sres(rb, h, io)
        if "downsample" in stage:
            ds = stage["downsample"]
            h = _spatial_down(ds["conv"], h)
            if "time_conv" in ds:
                h = _sdown3d_time(ds["time_conv"], h, io, first)
    h = _sres(p["mid_res1"], h, io)
    h = attention_block(p["mid_attn"], h)
    h = _sres(p["mid_res2"], h, io)
    h = vae_rms_norm(p["head_norm"], h)
    h = _sconv(p["head_conv"], _silu(h), io)
    return h, io.out


def _decoder_chunk(p: Params, z: jnp.ndarray, cfg: VAEConfig,
                   caches, first: bool):
    io = _CacheIO(None if first else caches)
    h = _sconv(p["conv1"], z, io)
    h = _sres(p["mid_res1"], h, io)
    h = attention_block(p["mid_attn"], h)
    h = _sres(p["mid_res2"], h, io)
    for stage in p["up"]:
        for rb in stage["res"]:
            h = _sres(rb, h, io)
        if "upsample" in stage:
            us = stage["upsample"]
            if "time_conv" in us:
                h = _sup3d_time(us["time_conv"], h, io, first)
            h = _spatial_up(us, h)
    h = vae_rms_norm(p["head_norm"], h)
    h = _sconv(p["head_conv"], _silu(h), io)
    return h, io.out


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------


def encode_streaming(params: Params, video: jnp.ndarray,
                     cfg: VAEConfig) -> jnp.ndarray:
    """[B, 3, T, H, W] → normalized latents, O(chunk) activation memory.
    T must be 4n+1 (the reference's chunking contract, vae.py:520)."""
    x = video.transpose(0, 2, 3, 4, 1)
    t = x.shape[1]
    n_rest = (t - 1) // 4

    first_out, caches = _encoder_chunk(params["encoder"], x[:, :1], cfg,
                                       None, first=True)
    if n_rest > 0:
        rest = x[:, 1:].reshape(x.shape[0], n_rest, 4, *x.shape[2:])

        def body(carry, chunk):
            out, new_caches = _encoder_chunk(params["encoder"], chunk, cfg,
                                             carry, first=False)
            return tuple(new_caches), out

        _, outs = jax.lax.scan(body, tuple(caches),
                               rest.transpose(1, 0, 2, 3, 4, 5))
        # outs: [n_rest, B, 1, H', W', C] → concat on time
        outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(
            first_out.shape[0], -1, *first_out.shape[2:])
        h = jnp.concatenate([first_out, outs], axis=1)
    else:
        h = first_out

    h = causal_conv3d(params["conv1"], h)
    mu = h[..., : cfg.z_dim]
    mean = jnp.asarray(LATENT_MEAN[:cfg.z_dim], mu.dtype)
    inv_std = 1.0 / jnp.asarray(LATENT_STD[:cfg.z_dim], mu.dtype)
    mu = (mu - mean) * inv_std
    return mu.transpose(0, 4, 1, 2, 3)


def decode_streaming(params: Params, z: jnp.ndarray,
                     cfg: VAEConfig,
                     chunk_frames: Optional[int] = None) -> jnp.ndarray:
    """Normalized latents [B, z, T', H', W'] → video.

    The reference decodes one latent frame per cache step
    (vae.py:552-566); the cache math is exact for any chunk size, so we
    process ``chunk_frames`` latent frames per scan step (auto: largest
    divisor of T'−1 up to 5) — larger per-step tensors amortize the many
    small convs and lift decoder MFU while keeping memory bounded.
    """
    zl = z.transpose(0, 2, 3, 4, 1)
    mean = jnp.asarray(LATENT_MEAN[:cfg.z_dim], zl.dtype)
    std = jnp.asarray(LATENT_STD[:cfg.z_dim], zl.dtype)
    zl = zl * std + mean
    zl = causal_conv3d(params["conv2"], zl)

    t = zl.shape[1]
    rest = t - 1
    if chunk_frames is None:
        # full-res activations ≈ chunk·4 frames × 8H'·8W' × dim·4 ch-eq
        # fp32 buffers; cap the live set to ~2 GB so decode fits beside
        # the DiT on 16 GB chips
        h_out, w_out = zl.shape[2] * 8, zl.shape[3] * 8
        per_chunk_frame = 4 * h_out * w_out * cfg.dim * 4 * 4  # ~4 bufs
        c_max = max(1, int((2 << 30) // per_chunk_frame))
        chunk_frames = 1
        for c in range(min(5, c_max, max(rest, 1)), 0, -1):
            if rest % c == 0:
                chunk_frames = c
                break
    assert rest % max(chunk_frames, 1) == 0 or rest == 0, (
        f"chunk_frames {chunk_frames} must divide T'-1 = {rest}")

    first_out, caches = _decoder_chunk(params["decoder"], zl[:, :1], cfg,
                                       None, first=True)
    if rest > 0:
        def body(carry, chunk):
            out, new_caches = _decoder_chunk(
                params["decoder"], chunk, cfg, carry, first=False)
            return tuple(new_caches), out

        n_chunks = rest // chunk_frames
        chunks = zl[:, 1:].reshape(
            zl.shape[0], n_chunks, chunk_frames,
            *zl.shape[2:]).transpose(1, 0, 2, 3, 4, 5)
        _, outs = jax.lax.scan(body, tuple(caches), chunks)
        outs = outs.transpose(1, 0, 2, 3, 4, 5).reshape(
            first_out.shape[0], -1, *first_out.shape[2:])
        x = jnp.concatenate([first_out, outs], axis=1)
    else:
        x = first_out

    x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 4, 1, 2, 3)
