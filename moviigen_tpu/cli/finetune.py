"""Fine-tuning driver CLI.

Parity target: ``scripts/train/finetune.py`` (FastVideo-based FSDP+SP
trainer) — same workload semantics and flag surface: precomputed-latent
dataset, SP-aware bucket sampler, flow-matching loss, grad accumulation,
grad clipping, LR schedules, TensorBoard metrics incl. per-timestep-bin
losses (``loss_bin_i``), periodic + signal-triggered checkpointing, LoRA.

TPU-native: torchrun/NCCL bootstrap is replaced by a (data, seq)
``jax.sharding.Mesh`` (``--sp_size`` maps to the seq axis); FSDP wrapping
by param sharding annotations; the SP timestep/noise broadcasts
(finetune.py:222-225) vanish — one program, one PRNG key.

Example:
    python -m moviigen_tpu.cli.finetune --task t2v-14B \
        --data_json_path data/preprocess/videos2caption.json \
        --sp_size 8 --train_batch_size 1 --max_train_steps 6000
"""

from __future__ import annotations

import argparse
import logging
import os
import signal
import sys
import time
from collections import deque

import numpy as np


def _parse_args(argv=None):
    p = argparse.ArgumentParser(description="Fine-tune the T2V DiT (TPU)")
    # model / data (ref finetune.py:692-924)
    p.add_argument("--task", type=str, default="t2v-14B")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="pretrained checkpoint dir (random init if unset)")
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--data_json_path", type=str, required=True)
    p.add_argument("--num_latent_t", type=int, default=21)
    p.add_argument("--max_seq_len", type=int, default=32760)
    p.add_argument("--cfg", type=float, default=0.0, dest="cfg_rate")
    p.add_argument("--output_dir", type=str, default="./outputs")
    # loop
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=100)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--gradient_checkpointing", action="store_true")
    # training memory recipe (docs/performance.md "Production-sequence-
    # length training"): bf16 residual stream + nested remat groups +
    # AD-friendly chunked FFN are what fit 32,760-token (480P-81f)
    # training on one 16 GB chip
    p.add_argument("--residual_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="residual-stream dtype inside the block scan; "
                        "bfloat16 matches the reference's autocast-bf16 "
                        "training numerics and halves the remat carry")
    p.add_argument("--remat_group", type=int, default=1,
                   help="checkpoint every g-th residual in the block scan "
                        "(nested remat; needs --gradient_checkpointing)")
    p.add_argument("--ffn_bwd_chunk", type=int, default=None,
                   help="AD-friendly token-chunked FFN (scan + per-chunk "
                        "checkpoint) bounding the FFN backward transient")
    p.add_argument("--attn_bwd_chunk", type=int, default=None,
                   help="AD-friendly q-token-chunked self-attention "
                        "bounding the attention backward working set "
                        "(the 75,600-token single-chip enabler)")
    # optim
    p.add_argument("--learning_rate", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    # flow matching
    p.add_argument("--compute_ot", action="store_true",
                   help="optimal-transport latent↔noise pairing (working "
                        "equivalent of the reference's broken --compute_ot)")
    p.add_argument("--weighting_scheme", type=str, default="uniform",
                   choices=["uniform", "logit_normal", "mode"])
    p.add_argument("--logit_mean", type=float, default=0.0)
    p.add_argument("--logit_std", type=float, default=1.0)
    p.add_argument("--mode_scale", type=float, default=1.29)
    # parallel
    p.add_argument("--sp_size", type=int, default=1)
    # lora
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--lora_rank", type=int, default=64)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--quant", type=str, default=None,
                   choices=["int8", "int4"],
                   help="QLoRA: freeze the base as a packed int8/int4 "
                        "tree (requires --use_lora). int4 puts the 14B "
                        "base at 8.3 GB — LoRA fine-tuning the flagship "
                        "on ONE 16 GB chip, vs the reference's 8x80 GB "
                        "training floor")
    p.add_argument("--lora_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="adapter (and AdamW moment) dtype; bfloat16 is "
                        "the single-chip 14B QLoRA recipe (bf16 master "
                        "+ moments, the finetune.sh:8 convention)")
    p.add_argument("--cross_attn_backend", type=str, default=None,
                   choices=["auto", "pallas", "chunked", "xla"],
                   help="attention backend override for the cross-"
                        "attention sites only")
    # misc
    p.add_argument("--export_safetensors", action="store_true",
                   help="also write reference-layout safetensors")
    p.add_argument("--profile_steps", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s: %(message)s")

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..configs import WAN_CONFIGS
    from ..models import wan_model
    from ..ops.rope import rope_3d_freqs
    from ..parallel.distributed import maybe_initialize_distributed
    from ..parallel.mesh import make_pod_mesh

    maybe_initialize_distributed()
    from ..training import TrainConfig
    from ..training.checkpoint import (latest_checkpoint,
                                       restore_checkpoint, save_checkpoint)
    from ..training.data import (
        DataLoader, LatentDataset,
        SPAwareAspectRatioLengthBucketDistributedSampler)
    from ..training.lora import attach_lora, init_lora_params

    cfg = WAN_CONFIGS[args.task]
    mcfg = cfg.model
    if args.ffn_bwd_chunk or args.attn_bwd_chunk or args.cross_attn_backend:
        import dataclasses as _dc

        mcfg = _dc.replace(mcfg,
                           ffn_bwd_chunk=args.ffn_bwd_chunk,
                           attn_bwd_chunk=args.attn_bwd_chunk,
                           cross_attn_backend=args.cross_attn_backend)
    n_dev = len(jax.devices())
    sp = args.sp_size
    assert n_dev % sp == 0, f"sp_size {sp} must divide devices {n_dev}"
    data_par = n_dev // sp
    # multi-slice pods: DP spans slices over DCN, SP stays on ICI
    mesh = make_pod_mesh(data=data_par, seq=sp) if n_dev > 1 else None
    logging.info("devices=%d mesh=%s", n_dev,
                 dict(mesh.shape) if mesh else None)

    # ---- model params
    if args.ckpt_dir:
        from ..models.wan_convert import load_wan_checkpoint

        params = load_wan_checkpoint(args.ckpt_dir, mcfg,
                                     dtype=jnp.float32)
    else:
        logging.warning("random-init DiT (no --ckpt_dir)")
        params = wan_model.init_params(jax.random.PRNGKey(args.seed), mcfg,
                                       dtype=jnp.float32)

    # ---- data
    dataset = LatentDataset(args.data_json_path, args.num_latent_t,
                            cfg_rate=args.cfg_rate,
                            txt_max_len=mcfg.text_len,
                            text_dim=mcfg.text_dim, seed=args.seed)
    # one process drives all local devices: the process-level sampler is
    # the DP-rank-0 view of the SP-aware sampler family
    sampler = SPAwareAspectRatioLengthBucketDistributedSampler(
        batch_size=args.train_batch_size * data_par,
        dataset_size=len(dataset), rank=0, world_size=1, sp_size=1,
        lengths=dataset.lengths, aspect_ratios=list(dataset.aspect_ratios),
        seed=args.seed)
    loader = DataLoader(dataset, sampler,
                        batch_size=args.train_batch_size * data_par)

    # ---- rope / step fn (shapes from the first batch)
    probe = dataset[0]
    c, t_lat, h_lat, w_lat = probe[0].shape
    grid = (t_lat // mcfg.patch_size[0], h_lat // mcfg.patch_size[1],
            w_lat // mcfg.patch_size[2])
    rope = rope_3d_freqs(grid, mcfg.head_dim)
    tokens = int(np.prod(grid))
    seq_len = -(-tokens // max(sp, 1)) * max(sp, 1)
    logging.info("latent %s → grid %s (%d tokens, seq_len %d)",
                 probe[0].shape, grid, tokens, seq_len)

    tc = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        weighting_scheme=args.weighting_scheme,
        logit_mean=args.logit_mean, logit_std=args.logit_std,
        mode_scale=args.mode_scale,
        num_train_timesteps=cfg.num_train_timesteps,
        remat=args.gradient_checkpointing,
        residual_dtype=args.residual_dtype,
        remat_group=args.remat_group,
        grad_accum_steps=args.gradient_accumulation_steps,
        compute_ot=args.compute_ot,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        max_train_steps=args.max_train_steps,
    )

    if args.quant:
        if not args.use_lora:
            raise SystemExit("--quant requires --use_lora (the packed "
                             "base is frozen; only adapters train)")
        from ..ops.quantization import quantize_wan_params

        params = quantize_wan_params(
            params, bits=4 if args.quant == "int4" else 8)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        logging.info("frozen base quantized to %s", args.quant)

    lora = None
    if args.use_lora:
        lora = init_lora_params(jax.random.PRNGKey(args.seed + 1), params,
                                rank=args.lora_rank,
                                dtype=jnp.dtype(args.lora_dtype))

    if mesh is not None:
        from ..parallel.sharding import dit_param_specs, shard_params

        params = shard_params(mesh, params, dit_param_specs(params))

    # trainable tree = lora or full params
    trainable = lora if args.use_lora else params

    from ..training.train_step import make_optimizer
    import optax

    # make_optimizer wraps optax.MultiSteps itself when
    # tc.grad_accum_steps > 1 — do NOT wrap again here (a second wrap
    # would silently update every k² microbatches)
    opt = make_optimizer(tc)
    opt_state = opt.init(trainable)
    if mesh is not None and not args.use_lora:
        # optimizer moments mirror the param shardings (FSDP sharded
        # optimizer state — replicated fp32 m/v would be 2x56 GB/chip
        # at 14B); scalars/counters replicate
        from ..parallel.sharding import opt_state_specs, dit_param_specs
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        ospecs = opt_state_specs(opt_state, trainable,
                                 dit_param_specs(trainable))
        del _P  # specs tree mirrors opt_state leaf-for-leaf
        opt_state = jax.tree_util.tree_map(
            lambda leaf, sp: jax.device_put(
                leaf, NamedSharding(mesh, sp)),
            opt_state, ospecs)

    # unified jitted step supporting full / LoRA fine-tuning
    from ..diffusion.flow_match import (
        compute_density_for_timestep_sampling, flow_match_noisy,
        flow_match_target, train_schedule)

    sigmas_tab = jnp.asarray(
        train_schedule(tc.num_train_timesteps, tc.schedule_shift)[0])
    use_sp = mesh is not None and sp > 1

    rdt = jnp.dtype(tc.residual_dtype)

    def forward(p, noisy, t, ctx):
        if use_sp:
            from ..parallel.ulysses import sequence_parallel_forward

            return sequence_parallel_forward(
                p, noisy, t, ctx, mcfg, rope, mesh,
                seq_len=seq_len if seq_len > tokens else None,
                remat=tc.remat, fsdp_params=True,
                residual_dtype=rdt, remat_group=tc.remat_group)
        return wan_model.forward(
            p, noisy, t, ctx, mcfg, rope,
            seq_len=seq_len if seq_len > tokens else None, remat=tc.remat,
            residual_dtype=rdt, remat_group=tc.remat_group)

    def train_step(trainable, opt_state, frozen, batch, key):
        latents, context = batch["latents"], batch["context"]
        b = latents.shape[0]
        k_noise, k_t = jax.random.split(key)
        noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
        if args.compute_ot:
            from ..training.ot import ot_pair_noise

            noise = ot_pair_noise(latents, noise)
        u = compute_density_for_timestep_sampling(
            k_t, tc.weighting_scheme, b, tc.logit_mean, tc.logit_std,
            tc.mode_scale)
        idx = jnp.clip((u * tc.num_train_timesteps).astype(jnp.int32), 0,
                       tc.num_train_timesteps - 1)
        sigmas = sigmas_tab[idx]

        def loss_fn(tr):
            # attach (rank-r side path), not merge: never materializes
            # the [L, d_in, d_out] delta and works on packed int4/int8
            # frozen bases (QLoRA)
            p = attach_lora(frozen, tr, alpha=args.lora_alpha,
                            rank=args.lora_rank) if args.use_lora else tr
            noisy = flow_match_noisy(latents, noise, sigmas)
            t = sigmas * tc.num_train_timesteps
            pred = forward(p, noisy, t, context)
            target = flow_match_target(latents, noise)
            return jnp.mean(jnp.square(pred - target)), t

        (loss, t), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable)
        gnorm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {
            "loss": loss, "grad_norm": gnorm, "timestep_mean": jnp.mean(t)}

    jit_step = jax.jit(train_step, donate_argnums=(0, 1))

    # ---- resume
    start_step = 0
    if args.resume_from_checkpoint:
        path = args.resume_from_checkpoint
        if path == "latest":
            found = latest_checkpoint(args.output_dir)
            path = found[0] if found else None
        if path:
            trainable, opt_state_r, start_step = restore_checkpoint(
                path, trainable, opt_state)
            if opt_state_r is not None:
                opt_state = opt_state_r
            logging.info("resumed from %s at step %d", path, start_step)

    # ---- TensorBoard (ref finetune.py:326-327, 641-656)
    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, "logs"))
    except Exception:
        writer = None

    def do_save(step, is_final=False):
        frozen_meta = {"final": is_final, "lora": bool(args.use_lora),
                       "quant": args.quant or "none"}
        if args.use_lora:
            # the watcher needs these to rebuild the A/B template and
            # apply the alpha/rank scale when attaching to a base
            frozen_meta["lora_rank"] = args.lora_rank
            frozen_meta["lora_alpha"] = args.lora_alpha
            frozen_meta["lora_dtype"] = args.lora_dtype
        path = save_checkpoint(
            args.output_dir, step, trainable, opt_state,
            extra_meta=frozen_meta,
            export_safetensors=args.export_safetensors and not args.use_lora,
            cfg=mcfg)
        if args.use_lora and args.export_safetensors:
            # adapters in peft layout (ref save_lora_checkpoint,
            # finetune.py:501-502)
            from ..training.checkpoint import export_lora_safetensors

            export_lora_safetensors(
                os.path.join(path, "lora_adapter.safetensors"),
                trainable, alpha=args.lora_alpha, rank=args.lora_rank)
        logging.info("saved checkpoint %s", path)

    # signal-triggered checkpoint (ref finetune.py:159-169, 508-510)
    def handler(signum, frame):
        logging.info("signal %d: checkpointing before exit", signum)
        do_save(step_counter[0], is_final=True)
        sys.exit(0)

    step_counter = [start_step]
    prev_int = signal.signal(signal.SIGINT, handler)
    prev_term = signal.signal(signal.SIGTERM, handler)

    # ---- loop
    key = jax.random.PRNGKey(args.seed)
    step_times = deque(maxlen=100)
    step = start_step
    epoch = 0
    data_sharding = None
    if mesh is not None:
        data_sharding = {
            "latents": NamedSharding(mesh, P("data")),
            "context": NamedSharding(mesh, P("data")),
        }

    from ..utils.profiling import PhaseTimer, trace

    timer = PhaseTimer(enabled=args.profile_steps > 0)
    profile_ctx = trace(os.path.join(args.output_dir, "profile")) \
        if args.profile_steps > 0 else None
    if profile_ctx is not None:
        profile_ctx.__enter__()

    while step < args.max_train_steps:
        sampler.set_epoch(epoch)
        dataset.set_epoch(epoch)
        for latents, embeds, latent_mask, embed_mask in loader:
            if step >= args.max_train_steps:
                break
            t0 = time.perf_counter()
            # zero out padded text positions (exact reference semantics)
            embeds = embeds * embed_mask[..., None]
            batch = {"latents": jnp.asarray(latents),
                     "context": jnp.asarray(embeds)}
            if data_sharding is not None:
                batch = {k: jax.device_put(v, data_sharding[k])
                         for k, v in batch.items()}
            key, sub = jax.random.split(key)
            with timer.phase("step", sync_tree=None):
                trainable, opt_state, metrics = jit_step(
                    trainable, opt_state,
                    params if args.use_lora else None, batch, sub)
            loss = float(metrics["loss"])  # scalar readback = sync point
            if profile_ctx is not None and step + 1 >= args.profile_steps:
                profile_ctx.__exit__(None, None, None)
                profile_ctx = None
                logging.info("profiler trace written; phases: %s",
                             timer.report())
            step += 1
            step_counter[0] = step
            dt = time.perf_counter() - t0
            step_times.append(dt)

            if writer is not None:
                writer.add_scalar("loss", loss, step)
                writer.add_scalar("grad_norm",
                                  float(metrics["grad_norm"]), step)
                writer.add_scalar("epoch", epoch, step)
                writer.add_scalar("time/step_time", dt, step)
                writer.add_scalar("time/avg_step_time",
                                  sum(step_times) / len(step_times), step)
                # per-timestep-bin loss (ref finetune.py:641-656)
                bin_i = int(float(metrics["timestep_mean"]) // 100)
                writer.add_scalar(f"loss_bin_{bin_i}", loss, step)
            if step % 10 == 0 or step == 1:
                logging.info("step %d loss %.5f grad_norm %.4f %.2fs/step",
                             step, loss, float(metrics["grad_norm"]), dt)
            if step % args.checkpointing_steps == 0:
                do_save(step)
        epoch += 1

    do_save(step, is_final=True)
    signal.signal(signal.SIGINT, prev_int)
    signal.signal(signal.SIGTERM, prev_term)
    if writer is not None:
        writer.close()
    logging.info("training done at step %d", step)


if __name__ == "__main__":
    main()
