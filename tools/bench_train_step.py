"""Production-sequence-length training-step benchmark (one TPU chip).

The reference's training envelope is 32,760-170,100 tokens
(scripts/train/finetune.sh:6-33 `--max_seq_len 170100`; finetune.py:708
"32760 480p 75600 720p"). This measures the full jitted train step —
flow-matching loss + grads + global-norm clip + AdamW — at the 480p
operating point (1.3B, 480x832x81f latents -> 32,760 DiT tokens),
remat per block, bf16 params (finetune.sh trains bf16 master weights).

Timing per CLAUDE.md: the step is ONE jitted program; chained
iterations are not possible (each step consumes a fresh batch/key and
donates state), so we time N sequential dispatches and subtract the
measured per-dispatch relay overhead.

Usage:
    python tools/bench_train_step.py                     # 1.3B @ 32,760
    python tools/bench_train_step.py --size 1280*720     # 75,600 tokens
    python tools/bench_train_step.py --ffn_chunk 16384   # compose the
        in-place stage streams with jax.checkpoint (remat)
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-1.3B")
    ap.add_argument("--size", default="480*832")
    ap.add_argument("--frame_num", type=int, default=81)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--ffn_chunk", type=int, default=None)
    ap.add_argument("--attn_head_chunk", type=int, default=None)
    ap.add_argument("--cross_attn_chunk", type=int, default=None)
    ap.add_argument("--ffn_bwd_chunk", type=int, default=None,
                    help="AD-friendly FFN token chunk (per-chunk "
                         "checkpoint) — the 75,600-token enabler; the "
                         "serving streams (--ffn_chunk) GROW training "
                         "memory instead")
    ap.add_argument("--attn_bwd_chunk", type=int, default=None,
                    help="AD-friendly q-token chunk for self-attention "
                         "(per-chunk checkpoint): bounds the per-layer "
                         "attention-backward working set — the r3 bound "
                         "on 75,600-token single-chip training")
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--remat_group", type=int, default=1,
                    help="checkpoint every g-th residual (carry stack "
                         "/g, same recompute) — g=3 closes the 240 MB "
                         "gap at 32,760 tokens")
    ap.add_argument("--residual_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 matches the reference's autocast "
                         "training numerics and halves the remat-carry "
                         "stack — required to fit 32,760 tokens on a "
                         "16 GB chip (fp32 carries OOM at 20.98 GB)")
    ap.add_argument("--attn_backend", default="pallas",
                    help="'auto' probes lowering (use on CPU smoke runs)")
    ap.add_argument("--cross_attn_backend", default=None,
                    choices=["auto", "pallas", "chunked", "xla"],
                    help="backend override for cross-attention only "
                         "(e.g. pallas while self runs chunked — the "
                         "chunked path's whole-L [N,L,512] score "
                         "buffers are 2.5 GB f32 at 32,760 tokens)")
    ap.add_argument("--aot", action="store_true",
                    help="AOT-compile only (abstract args, chipless "
                         "buffer assignment) and print the memory "
                         "analysis — cannot OOM or crash the worker")
    ap.add_argument("--lora_rank", type=int, default=0,
                    help="QLoRA: train rank-r adapters over a frozen "
                         "base (0 = full fine-tune)")
    ap.add_argument("--quant", default=None, choices=["int4", "int8"],
                    help="pack the frozen base (requires --lora_rank): "
                         "int4 puts the 14B base at 8.3 GB — flagship "
                         "LoRA fine-tuning on ONE 16 GB chip")
    ap.add_argument("--lora_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="adapter (and AdamW moment) dtype — bfloat16 "
                         "matches the repo's sp-cert convention of bf16 "
                         "master + moments (finetune.sh:8) and saves "
                         "1.26 GB at 14B rank 32")
    ap.add_argument("--compiler_opt", action="append", default=[],
                    metavar="KEY=VALUE",
                    help="extra XLA compiler option(s) for the step "
                         "program, e.g. xla_tpu_enable_latency_hiding_"
                         "scheduler=false to trade overlap for peak "
                         "memory (repeatable)")
    args = ap.parse_args()
    if args.quant and not args.lora_rank:
        ap.error("--quant requires --lora_rank (the packed base is "
                 "frozen; only adapters train)")

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.training import (TrainConfig, init_train_state,
                                       make_train_step)
    from moviigen_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    cfg = WAN_CONFIGS[args.task].model
    if (args.ffn_chunk or args.attn_head_chunk or args.cross_attn_chunk
            or args.ffn_bwd_chunk or args.attn_bwd_chunk
            or args.cross_attn_backend):
        cfg = dataclasses.replace(cfg, ffn_chunk=args.ffn_chunk,
                                  attn_head_chunk=args.attn_head_chunk,
                                  cross_attn_chunk=args.cross_attn_chunk,
                                  ffn_bwd_chunk=args.ffn_bwd_chunk,
                                  attn_bwd_chunk=args.attn_bwd_chunk,
                                  cross_attn_backend=args.cross_attn_backend)
    w, h = (int(v) for v in args.size.split("*"))
    fp = (args.frame_num - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    print(f"task={args.task} {w}x{h}x{args.frame_num}f tokens={tokens} "
          f"remat={not args.no_remat} ffn_chunk={cfg.ffn_chunk}",
          flush=True)

    rope = rope_3d_freqs(grid, cfg.head_dim)
    tc = TrainConfig(remat=not args.no_remat,
                     residual_dtype=args.residual_dtype,
                     remat_group=args.remat_group)
    step = make_train_step(cfg, tc, rope, attn_backend=args.attn_backend,
                           lora_rank=max(args.lora_rank, 1))
    qlora = args.lora_rank > 0

    def make_frozen(abstract: bool):
        """Frozen base tree for QLoRA (packed when --quant)."""
        from moviigen_tpu.ops.quantization import device_init_quantized_wan

        if args.quant:
            fn = lambda: device_init_quantized_wan(  # noqa: E731
                0, cfg, bits=4 if args.quant == "int4" else 8)
        else:
            fn = lambda: wan_model.init_params(  # noqa: E731
                jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        return jax.eval_shape(fn) if abstract else jax.jit(fn)()

    if args.aot:
        # chipless fit probe: abstract shapes through the remote AOT
        # compiler (mem_probe.py pattern) — donation honored, no alloc
        from moviigen_tpu.training.lora import init_lora_params

        if qlora:
            frozen_s = make_frozen(abstract=True)
            params_s = jax.eval_shape(
                lambda: init_lora_params(
                    jax.random.PRNGKey(1),
                    jax.tree_util.tree_map(
                        lambda s: jnp.zeros(s.shape, s.dtype), frozen_s),
                    rank=args.lora_rank,
                    dtype=jnp.dtype(args.lora_dtype)))
        else:
            frozen_s = None
            params_s = jax.eval_shape(lambda: wan_model.init_params(
                jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
        opt_s = jax.eval_shape(
            lambda p: init_train_state(p, tc)[1], params_s)
        batch_s = {
            "latents": jax.ShapeDtypeStruct(
                (1, cfg.in_dim, fp, h // 8, w // 8), jnp.float32),
            "context": jax.ShapeDtypeStruct(
                (1, cfg.text_len, cfg.text_dim), jnp.bfloat16),
        }
        key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)
        print("lowering...", flush=True)
        jitted = jax.jit(step, donate_argnums=(0, 1))
        lowered = jitted.lower(params_s, opt_s, batch_s, key_s, frozen_s) \
            if qlora else jitted.lower(params_s, opt_s, batch_s, key_s)
        print("compiling (backend buffer assignment)...", flush=True)
        copts = dict(kv.split("=", 1) for kv in args.compiler_opt)
        compiled = lowered.compile(compiler_options=copts) \
            if copts else lowered.compile()
        ma = compiled.memory_analysis()
        print("compiled OK", flush=True)
        if ma is not None:
            for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                      "output_size_in_bytes", "alias_size_in_bytes",
                      "generated_code_size_in_bytes"):
                v = getattr(ma, k, None)
                if v is not None:
                    print(f"{k}: {v / 1e9:.3f} GB", flush=True)
        return

    frozen = None
    if qlora:
        from moviigen_tpu.training.lora import init_lora_params

        frozen = make_frozen(abstract=False)
        jax.block_until_ready(frozen)
        params = init_lora_params(jax.random.PRNGKey(1), frozen,
                                  rank=args.lora_rank,
                                  dtype=jnp.dtype(args.lora_dtype))
    else:
        params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    print("params on device", flush=True)
    _, opt_state = init_train_state(params, tc)
    jax.block_until_ready(opt_state)

    batch = {
        "latents": jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, cfg.in_dim, fp, h // 8, w // 8)), jnp.float32),
        "context": jnp.zeros((1, cfg.text_len, cfg.text_dim),
                             jnp.bfloat16),
    }

    copts = dict(kv.split("=", 1) for kv in args.compiler_opt)
    jitted = jax.jit(step, donate_argnums=(0, 1),
                     compiler_options=copts or None)

    # dispatch overhead (CLAUDE.md: each scalar readback ~30-40 ms)
    trivial = jax.jit(lambda v: jnp.sum(v))
    x0 = jnp.ones((8,), jnp.float32)
    float(trivial(x0))
    t0 = time.perf_counter()
    for _ in range(3):
        float(trivial(x0))
    overhead = (time.perf_counter() - t0) / 3

    key = jax.random.PRNGKey(0)
    print("compiling train step", flush=True)
    t0 = time.perf_counter()
    step_args = (batch, key, frozen) if qlora else (batch, key)
    params, opt_state, metrics = jitted(params, opt_state, *step_args)
    loss = float(metrics["loss"])  # forces completion
    print(f"compiled + step0 in {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    times = []
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        step_args = (batch, sub, frozen) if qlora else (batch, sub)
        params, opt_state, metrics = jitted(params, opt_state, *step_args)
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0 - overhead
        times.append(dt)
        print(f"step {i + 1}: {dt:.3f}s loss={loss:.4f} "
              f"grad_norm={float(metrics['grad_norm']):.3f}", flush=True)

    sec = min(times)

    # FLOPs: fwd (bench.py formulas) x3 for fwd+bwd, +1 fwd per remat
    # recompute level (per-layer checkpointing re-runs the forward once;
    # nested remat groups re-run it twice — group pass + layer pass).
    # QLoRA skips the base dW GEMMs: bwd ≈ 1x fwd (dx only), so the
    # no-remat multiplier is 2, not 3.
    d, ffn, layers = cfg.dim, cfg.ffn_dim, cfg.num_layers
    per_tok_lin = 6 * d * d + 2 * d * ffn
    fwd_flops = 2 * layers * (per_tok_lin * tokens
                              + 2 * d * d * cfg.text_len) \
        + 4 * layers * d * (tokens * tokens + tokens * cfg.text_len)
    goodput_mult = 2 if qlora else 3
    mult = goodput_mult
    if not args.no_remat:
        mult += 2 if args.remat_group > 1 else 1
    total = mult * fwd_flops
    tfs = total / sec / 1e12
    tag = ""
    if qlora:
        tag = f"_qlora_r{args.lora_rank}" + (
            f"_{args.quant}" if args.quant else "")
    print(json.dumps({
        "metric": (f"sec_per_train_step_{args.task}_{w}x{h}_"
                   f"{args.frame_num}f_remat{tag}"),
        "value": round(sec, 3),
        "unit": "s/step",
        "tokens": tokens,
        "achieved_tflops": round(tfs, 1),
        "model_tflops": round(goodput_mult * fwd_flops / sec / 1e12, 1),
        "note": (f"fwd+bwd+remat-recompute+AdamW, "
                 f"{'packed ' + args.quant + ' frozen base + rank-'
                    + str(args.lora_rank) + ' adapters, ' if qlora else
                    'bf16 params, '}"
                 f"{args.residual_dtype} residuals, "
                 f"remat_group={args.remat_group}, "
                 f"{mult}x fwd executed-FLOPs accounting "
                 f"(model_tflops = {goodput_mult}x goodput)"),
    }), flush=True)


if __name__ == "__main__":
    main()
