"""Image→video conditioning + pipeline (i2v model variant).

The reference ships the i2v *model* paths (WanI2VCrossAttention, MLPProj,
mask+y+CLIP conditioning built during preprocessing —
``preprocess_wan_dataset.py:489-536``) but no i2v inference entry point or
weights. This module provides both halves the TPU way:

- ``build_i2v_conditioning``: the exact conditioning construction from the
  preprocessing branch — first-frame mask repeated 4× and folded to the
  latent temporal grid, VAE encoding of [image, zeros×(F−1)], CLIP 31st
  block features;
- ``WanI2V``: a generate() pipeline around the i2v DiT variant
  (in_dim = 16 latent + 20 conditioning channels).
"""

from __future__ import annotations

import logging
import math
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import PipelineConfig, WanModelConfig
from ..models import clip as clipm
from ..models import vae as vaem
from .text2video import WanT2V


def build_i2v_mask(frames: int, lat_h: int, lat_w: int) -> jnp.ndarray:
    """First-frame conditioning mask folded into the latent grid
    (ref preprocess_wan_dataset.py:506-513): [4, (F−1)/4+1, lat_h, lat_w]."""
    msk = jnp.zeros((1, frames, lat_h, lat_w), jnp.float32)
    msk = msk.at[:, 0].set(1.0)
    msk = jnp.concatenate(
        [jnp.repeat(msk[:, 0:1], 4, axis=1), msk[:, 1:]], axis=1)
    t4 = msk.shape[1] // 4
    msk = msk.reshape(1, t4, 4, lat_h, lat_w)
    return msk.transpose(0, 2, 1, 3, 4)[0]  # [4, T', lat_h, lat_w]


def build_i2v_conditioning(vae_params, clip_params, image: jnp.ndarray,
                           frames: int, size: Tuple[int, int],
                           vae_cfg, clip_cfg=None):
    """image: [3, H, W] in [-1, 1] → (y [20, T', h/8, w/8],
    clip_fea [1, 257, 1280]).

    ref preprocess_wan_dataset.py:489-536: y = concat([mask,
    VAE.encode(concat([resized image, zeros(3, F−1, h, w)]))]);
    clip features from the raw (un-resized) first frame."""
    w, h = size
    lat_h, lat_w = h // 8, w // 8
    img = jax.image.resize(image, (3, h, w), method="bicubic")
    vid = jnp.concatenate(
        [img[:, None], jnp.zeros((3, frames - 1, h, w), img.dtype)], axis=1)
    y_lat = vaem.encode(vae_params, vid[None], vae_cfg)[0]
    msk = build_i2v_mask(frames, lat_h, lat_w)
    y = jnp.concatenate([msk, y_lat.astype(jnp.float32)], axis=0)
    clip_fea = clipm.visual_features(
        clip_params, image[None],
        clip_cfg or clipm.CLIPVisionConfig())
    return y, clip_fea


class WanI2V(WanT2V):
    """Image→video pipeline: WanT2V plus the CLIP tower and conditioned
    forward (clip_fea + y channel-concat, ref model.py:516-524)."""

    def __init__(self, config: PipelineConfig,
                 checkpoint_dir: Optional[str] = None,
                 clip_checkpoint: str =
                 "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
                 **kw):
        assert config.model.model_type == "i2v", \
            "WanI2V needs an i2v model config"
        super().__init__(config, checkpoint_dir=checkpoint_dir, **kw)
        self.clip_cfg = clipm.CLIPVisionConfig()
        if checkpoint_dir is not None and os.path.exists(
                os.path.join(checkpoint_dir, clip_checkpoint)):
            self.clip_params = clipm.load_clip_checkpoint(
                os.path.join(checkpoint_dir, clip_checkpoint),
                self.clip_cfg)
        else:
            logging.warning("random-init CLIP tower (no checkpoint)")
            self.clip_params = clipm.init_vision_params(
                jax.random.PRNGKey(7), self.clip_cfg)

    def _denoise_fn(self, grid, seq_len, guide_scale):
        key = ("i2v", grid, seq_len, guide_scale)
        if key not in self._denoise_step_cache:
            from ..models import wan_model
            from ..ops.rope import rope_3d_freqs

            cfg = self.config.model
            rope = rope_3d_freqs(grid, cfg.head_dim)
            backend = self.attn_backend

            # same CFG-pairing rule as the T2V pipeline: batched pair
            # while the doubled activations fit, else two dispatches of
            # one compiled B=1 forward (halves the long-seq compile too)
            cfg_batched = 2 * 2 * seq_len * (3 * cfg.dim) <= (1 << 30)

            if cfg_batched:
                def step(dit_params, latent, t, ctx_pair, y, clip_fea):
                    x2 = jnp.concatenate([latent, latent], axis=0)
                    t2 = jnp.concatenate([t, t], axis=0)
                    y2 = jnp.concatenate([y[None], y[None]], axis=0)
                    cf2 = jnp.concatenate([clip_fea, clip_fea], axis=0)
                    pred = wan_model.forward(
                        dit_params, x2, t2, ctx_pair, cfg, rope,
                        seq_len=seq_len, attn_backend=backend,
                        clip_fea=cf2, y=y2,
                        residual_dtype=self._residual_dtype)
                    return pred[1:] + guide_scale * (pred[:1] - pred[1:])

                self._denoise_step_cache[key] = jax.jit(step)
            else:
                @jax.jit
                def fwd_j(dit_params, latent, t, ctx, y, clip_fea):
                    return wan_model.forward(
                        dit_params, latent, t, ctx, cfg, rope,
                        seq_len=seq_len, attn_backend=backend,
                        clip_fea=clip_fea, y=y[None],
                        residual_dtype=self._residual_dtype)

                combine = jax.jit(lambda c, u: u + guide_scale * (c - u))

                def step(dit_params, latent, t, ctx_pair, y, clip_fea):
                    cond = fwd_j(dit_params, latent, t, ctx_pair[:1],
                                 y, clip_fea)
                    uncond = fwd_j(dit_params, latent, t, ctx_pair[1:],
                                   y, clip_fea)
                    return combine(cond, uncond)

                self._denoise_step_cache[key] = step
        return self._denoise_step_cache[key]

    def generate(self, input_prompt: str, image: np.ndarray,
                 size: Tuple[int, int] = (1280, 720),
                 frame_num: int = 81, shift: float = 5.0,
                 sample_solver: str = "unipc", sampling_steps: int = 40,
                 guide_scale: float = 5.0, n_prompt: str = "",
                 seed: int = -1, noise: Optional[np.ndarray] = None,
                 return_latents: bool = False):
        """image: [3, H, W] float in [-1, 1]."""
        from ..diffusion import (FlowDPMSolverMultistepScheduler,
                                 FlowUniPCMultistepScheduler,
                                 get_sampling_sigmas)

        from .text2video import compute_target_shape_and_seq_len

        f = frame_num
        target_shape, seq_len, grid = compute_target_shape_and_seq_len(
            self.config, size, frame_num, self.sp_size)

        if n_prompt == "":
            n_prompt = self.sample_neg_prompt
        if seed < 0:
            seed = int.from_bytes(os.urandom(4), "little")

        ctx_pair = self.encode_text([input_prompt, n_prompt])
        y, clip_fea = build_i2v_conditioning(
            self.vae_params, self.clip_params, jnp.asarray(image),
            f, size, self.config.vae, self.clip_cfg)

        if noise is None:
            latent = jax.random.normal(jax.random.PRNGKey(seed),
                                       (1, *target_shape), jnp.float32)
        else:
            latent = jnp.asarray(noise, jnp.float32).reshape(
                1, *target_shape)

        if sample_solver == "unipc":
            sched = FlowUniPCMultistepScheduler(
                num_train_timesteps=self.num_train_timesteps, shift=1.0)
            sched.set_timesteps(sampling_steps, shift=shift)
        elif sample_solver == "dpm++":
            sched = FlowDPMSolverMultistepScheduler(
                num_train_timesteps=self.num_train_timesteps, shift=1.0)
            sched.set_timesteps(
                sampling_steps,
                sigmas=get_sampling_sigmas(sampling_steps, shift))
        else:
            raise NotImplementedError(sample_solver)

        step_fn = self._denoise_fn(grid, seq_len, float(guide_scale))
        state = sched.init_state(latent)
        for i, t in enumerate(sched.timesteps):
            pred = step_fn(self.dit_params, latent,
                           jnp.asarray([float(t)], jnp.float32),
                           ctx_pair, y, clip_fea)
            latent, state = sched.step(pred, i, latent, state)

        if return_latents:
            return np.asarray(latent[0])
        video = self._vae_decode(self.vae_params, latent)
        return np.asarray(video[0], np.float32)
