"""Flow-matching fine-tune step (FastVideo-style training semantics).

Parity target: ``scripts/train/finetune.py::process_batch`` (L171-266) +
the optimizer/grad-clip plumbing of ``main`` (L392-398, 576-606):

    σ ~ schedule[density_sample(u)]
    noisy = σ·noise + (1−σ)·latents
    pred  = DiT(noisy, t=σ·T, context)
    loss  = mean((pred − (noise − latents))²)
    grads → clip by global norm → AdamW → params

TPU-native: the whole step (loss, grads, clip, optimizer) is ONE jitted
function laid out over the (data, seq) mesh — params sharded on ``seq``
(FSDP analog), batch on ``data``, remat per block. The reference's
FSDP wrapper, SP process groups, grad-scaler and timestep/noise
broadcasts (finetune.py:222-225) all disappear: one program, one PRNG
key, compiler-placed collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..configs import WanModelConfig
from ..diffusion.flow_match import (
    compute_density_for_timestep_sampling,
    flow_match_noisy,
    flow_match_target,
    train_schedule,
)
from ..models import wan_model
from ..ops.rope import RopeTables


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-6          # finetune.sh: lr 1e-6
    weight_decay: float = 1e-4           # finetune.py default
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    max_grad_norm: float = 1.0           # finetune.py:595
    weighting_scheme: str = "uniform"    # uniform | logit_normal | mode
    logit_mean: float = 0.0
    logit_std: float = 1.0
    mode_scale: float = 1.29
    num_train_timesteps: int = 1000
    schedule_shift: float = 1.0
    remat: bool = True
    # Residual-stream dtype inside the block scan. "bfloat16" matches
    # the reference's training numerics (model_seq.py runs the whole
    # forward under torch.autocast(bfloat16) — finetune.py:244-248 —
    # so its hidden/residual stream IS bf16 outside the pinned fp32
    # islands) and halves the per-layer remat-carry stack
    # ([layers, B, L, D] fp32 = 5.62 GB at 32,760 tokens/1.3B — the
    # allocation that OOMs a 16 GB chip). "float32" keeps the stricter
    # fp32 residual discipline of the serving default.
    residual_dtype: str = "float32"
    # Checkpoint every g-th residual in the block scan instead of every
    # layer (run_blocks remat_group): carry stack /g, recompute budget
    # unchanged. g=3 turns the 32,760-token 1.3B step's 2.81 GB carry
    # into 0.94 GB — with bf16 residuals that is what closes the 240 MB
    # OOM gap on a 16 GB chip. NOTE: token-streaming (ffn_chunk etc.) is
    # a serving-only memory tool — under autodiff the loop carries are
    # saved per chunk and memory GROWS (+3 GB measured via --aot).
    remat_group: int = 1
    grad_accum_steps: int = 1            # finetune.py:535-597 accumulation cycle
    compute_ot: bool = False             # OT noise pairing (finetune.py:206-208)
    lr_warmup_steps: int = 0
    lr_scheduler: str = "constant"       # constant | linear | cosine
    max_train_steps: int = 100


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    if tc.lr_scheduler == "constant":
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, tc.learning_rate,
                                             max(tc.lr_warmup_steps, 1)),
             optax.schedules.constant_schedule(tc.learning_rate)],
            [max(tc.lr_warmup_steps, 1)]) \
            if tc.lr_warmup_steps > 0 else tc.learning_rate
    elif tc.lr_scheduler == "linear":
        lr = optax.schedules.linear_schedule(
            tc.learning_rate, 0.0, tc.max_train_steps)
    elif tc.lr_scheduler == "cosine":
        lr = optax.schedules.cosine_decay_schedule(
            tc.learning_rate, tc.max_train_steps)
    else:
        raise ValueError(tc.lr_scheduler)
    opt = optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(lr, b1=tc.betas[0], b2=tc.betas[1], eps=tc.eps,
                    weight_decay=tc.weight_decay),
    )
    if tc.grad_accum_steps > 1:
        # reference semantics (finetune.py:575-597): grads average over
        # the accumulation window, params update once per cycle
        opt = optax.MultiSteps(opt, tc.grad_accum_steps)
    return opt


def init_train_state(params: Dict[str, Any], tc: TrainConfig):
    opt = make_optimizer(tc)
    return opt, opt.init(params)


def make_train_step(cfg: WanModelConfig, tc: TrainConfig,
                    rope: RopeTables, seq_len: Optional[int] = None,
                    attn_backend: str = "auto", mesh=None,
                    sp_mode: Optional[str] = None,
                    lora_alpha: float = 64.0, lora_rank: int = 64):
    """Returns ``step(params, opt_state, batch, key, frozen=None) →
    (params, opt_state, metrics)``; jit at the call site with the desired
    shardings. With a mesh whose sequence axes (``seq``, and ``ring`` on
    a 3-axis mesh) exceed 1, the forward runs sequence-parallel — the
    training analog of ``model_seq.py``'s ``sp_size`` (finetune.sh:
    sp_size 8). ``sp_mode`` defaults to 'usp' on a (data, ring, seq)
    mesh and 'ulysses' otherwise (the reference trains Ulysses-only;
    ring/hybrid extend it to >per-chip sequences).

    LoRA (reference ``--use_lora``, finetune.py:364-374): pass the A/B
    tree as ``params`` and the base model tree as ``frozen`` — the step
    trains only A/B via the attached rank-r side path. ``frozen`` may
    be an int4/int8-quantized tree (QLoRA): the packed base stays
    byte-identical in HBM (8.3 GB at 14B int4) and only the adapters +
    their AdamW moments are optimizer state — 14B fine-tuning on ONE
    16 GB chip, where the reference's 14B training floor is 8×80 GB
    GPUs (finetune.sh:6-33)."""
    sigmas_tab, _ = train_schedule(tc.num_train_timesteps,
                                   tc.schedule_shift)
    sigmas_tab = jnp.asarray(sigmas_tab)
    opt = make_optimizer(tc)
    from ..parallel.mesh import mesh_axis_size

    use_sp = mesh_axis_size(mesh, "ring") * mesh_axis_size(mesh, "seq") > 1
    if sp_mode is None:
        sp_mode = "usp" if (mesh is not None
                            and "ring" in mesh.axis_names) else "ulysses"

    rdt = jnp.dtype(tc.residual_dtype)

    def loss_fn(params, latents, context, noise, sigmas, frozen=None):
        if frozen is not None:
            from .lora import attach_lora

            params = attach_lora(frozen, params, alpha=lora_alpha,
                                 rank=lora_rank)
        noisy = flow_match_noisy(latents, noise, sigmas)
        t = sigmas * tc.num_train_timesteps  # timesteps = σ·T
        if use_sp:
            from ..parallel.ulysses import sequence_parallel_forward

            pred = sequence_parallel_forward(
                params, noisy, t, context, cfg, rope, mesh,
                seq_len=seq_len, remat=tc.remat, sp_mode=sp_mode,
                attn_backend=attn_backend, fsdp_params=True,
                residual_dtype=rdt, remat_group=tc.remat_group)
        else:
            pred = wan_model.forward(
                params, noisy, t, context, cfg, rope, seq_len=seq_len,
                remat=tc.remat, attn_backend=attn_backend,
                residual_dtype=rdt, remat_group=tc.remat_group)
        target = flow_match_target(latents, noise)
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32)
                                   - target.astype(jnp.float32)))
        return loss, t

    def step(params, opt_state, batch, key, frozen=None):
        latents = batch["latents"]
        context = batch["context"]
        b = latents.shape[0]
        k_noise, k_t = jax.random.split(key)
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        if tc.compute_ot:
            from .ot import ot_pair_noise

            noise = ot_pair_noise(latents, noise)
        u = compute_density_for_timestep_sampling(
            k_t, tc.weighting_scheme, b, tc.logit_mean, tc.logit_std,
            tc.mode_scale)
        idx = jnp.clip((u * tc.num_train_timesteps).astype(jnp.int32),
                       0, tc.num_train_timesteps - 1)
        sigmas = sigmas_tab[idx]

        (loss, t), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, latents, context, noise, sigmas, frozen)
        # NOTE: with grad_accum_steps > 1 this is the RAW per-microbatch
        # gradient norm, not the clipped norm of the accumulated gradient
        # the reference logs at cycle end (finetune.py:594) — the two
        # logged series are not directly comparable under accumulation.
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, "grad_norm": gnorm,
                   "timestep_mean": jnp.mean(t)}
        return params, opt_state, metrics

    return step
