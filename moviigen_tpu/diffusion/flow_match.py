"""Flow-matching training utilities.

Parity: ``scripts/train/finetune.py:122-157`` (sigma lookup and timestep
density sampling) and ``process_batch`` (``finetune.py:171-266``):

    noisy = σ·noise + (1−σ)·latents
    target = noise − latents
    loss = mean((pred − target)²)

The training noise schedule is the diffusers FlowMatchEulerDiscreteScheduler
(``finetune.py:382-386``): sigmas = linspace(1, 1/T, T) shifted by the
``--sp_shift``-style shift, with ``timesteps = sigmas·T``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .solvers import shift_sigmas


def train_schedule(num_train_timesteps: int = 1000,
                   shift: float = 1.0) -> tuple[np.ndarray, np.ndarray]:
    """Training sigmas/timesteps (diffusers FlowMatchEulerDiscreteScheduler
    semantics): sigmas descend from 1 to 1/T, timesteps = σ·T."""
    sigmas = np.linspace(1.0, 1.0 / num_train_timesteps,
                         num_train_timesteps, dtype=np.float64)
    sigmas = shift_sigmas(sigmas, shift)
    timesteps = sigmas * num_train_timesteps
    return sigmas.astype(np.float32), timesteps.astype(np.float32)


def compute_density_for_timestep_sampling(
        key: jax.Array, weighting_scheme: str, batch_size: int,
        logit_mean: Optional[float] = None,
        logit_std: Optional[float] = None,
        mode_scale: Optional[float] = None) -> jnp.ndarray:
    """u ∈ [0,1) density draw (ref finetune.py:134-157)."""
    if weighting_scheme == "logit_normal":
        u = logit_mean + logit_std * jax.random.normal(key, (batch_size,))
        u = jax.nn.sigmoid(u)
    elif weighting_scheme == "mode":
        u = jax.random.uniform(key, (batch_size,))
        u = 1 - u - mode_scale * (jnp.cos(jnp.pi * u / 2) ** 2 - 1 + u)
    else:
        u = jax.random.uniform(key, (batch_size,))
    return u


def sigmas_for_timesteps(u: jnp.ndarray, sigmas: np.ndarray,
                         num_train_timesteps: int = 1000) -> jnp.ndarray:
    """Map density draws u → schedule index → σ (ref finetune.py:218-233:
    ``indices = (u·T).long(); timesteps = scheduler.timesteps[indices]``,
    then ``get_sigmas`` looks the σ back up by timestep — net effect is
    ``σ = sigmas[indices]``)."""
    idx = jnp.clip((u * num_train_timesteps).astype(jnp.int32),
                   0, num_train_timesteps - 1)
    return jnp.asarray(sigmas)[idx]


def flow_match_noisy(latents: jnp.ndarray, noise: jnp.ndarray,
                     sigmas: jnp.ndarray) -> jnp.ndarray:
    """noisy = σ·noise + (1−σ)·x   (ref finetune.py:235)."""
    while sigmas.ndim < latents.ndim:
        sigmas = sigmas[..., None]
    return sigmas * noise + (1.0 - sigmas) * latents


def flow_match_target(latents: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """target = noise − x   (ref finetune.py:256)."""
    return noise - latents
