"""Headline benchmark: sec per CFG denoise step on one TPU chip.

Workload: Wan-family DiT denoise step — one CFG-guided model evaluation
(cond + uncond batched, B=2) at 480x832, 81 frames (latent 21x60x104 →
32,760 tokens; formula ref wan/text2video.py:160-166), Pallas flash
attention, bf16 params.

Default model is the 14B flagship (the reference's published model):
bf16 on big-HBM parts; on a 16 GB v5e it runs whole via int4 grouped
weight-only quantization (8.3 GB params, ~137 TF/s effective — the
regime the reference needs multi-GPU FSDP for). --task t2v-1.3B
benches the small config in bf16 (BASELINE.json config #1).

Resilience: the remote-TPU worker can end up in a degraded state
(leaked HBM from crashed clients accumulates until the worker
recovers), so each attempt runs in a killable subprocess with a
timeout, falling back from the 14B-int4 flagship to the 1.3B bf16
operating point rather than hanging or crashing without a metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu",
"chip", ...}. vs_baseline is per-chip step throughput vs the A100
PyTorch reference — no published number exists (BASELINE.md), so we
report the ratio against an A100 roofline estimate for the same
workload (bf16 312 TFLOPs, 60% MFU ≈ upper bound of the reference
stack). "mfu" + "chip" + "peak_tflops" make the line self-explaining:
on a 16 GB v5e (197 bf16 TFLOPs ≈ 0.63× A100 peak) an a100-ratio of
~0.7 is ~70% MFU; the BASELINE target (≥2× per chip) refers to v5p
(459 TFLOPs — see docs/performance.md "projected v5p").
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def run_once(task, quant, size, frame_num, ffn_chunk_arg,
             residual_dtype="float32", stream_impl="fori"):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    cfg = WAN_CONFIGS[task].model
    # size is (W, H) like SIZE_CONFIGS; default 480*832 @ 81f → latent
    # (F',H',W') = (21, 104, 60) → 32,760 tokens (formula ref
    # wan/text2video.py:160-166)
    w, h = (int(v) for v in size.split("*"))
    fp = (frame_num - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]

    # FFN token-chunking rule (same as pipelines/text2video.py incl.
    # the tighter quantized-mode threshold): bound the [2, L, ffn]
    # transient — what lets 131k-token 1080p run on one 16 GB chip, and
    # keeps the bench measuring the same FFN configuration the serving
    # path uses
    ffn_chunk = ffn_chunk_arg
    limit = (1 << 30) if quant else (1 << 31)
    if ffn_chunk is None and 4 * tokens * cfg.ffn_dim > limit:
        ffn_chunk = 16384
    if ffn_chunk:
        import dataclasses

        cfg = dataclasses.replace(cfg, ffn_chunk=ffn_chunk)
    # head-chunking rule (same as pipelines/text2video.py): past ~75k
    # tokens the full-head q/k/v/out transients kill the 16 GB worker —
    # run self-attention 8 heads at a time there
    attn_hc = None
    if 6 * tokens * cfg.dim > 2_400_000_000:
        import dataclasses

        attn_hc = next((hh for hh in (8, 5, 4, 2)
                        if cfg.num_heads % hh == 0
                        and hh < cfg.num_heads), None)
        if attn_hc:
            # streamed attention executes only under stream_impl=unroll
            # on this worker (the fori form faults at execute — r3
            # bisect, docs/performance.md "Single-chip 1080P-81f")
            cfg = dataclasses.replace(cfg, attn_head_chunk=attn_hc,
                                      cross_attn_chunk=16384,
                                      stream_impl=stream_impl)
            # fp32 residuals don't fit the 131k-token single-chip
            # envelope (the bf16 residual stream is what closes the
            # 1080P-81f budget — docs/performance.md); <1% parity
            # impact measured at 1.3B
            if residual_dtype == "float32":
                _log("auto residual_dtype=bfloat16 (streamed-attention "
                     "memory envelope)")
                residual_dtype = "bfloat16"
    lat_shape = (1, cfg.in_dim, fp, h // 8, w // 8)

    _log(f"start {task} {quant} {size} {frame_num}f tokens={tokens} "
         f"ffn_chunk={ffn_chunk} attn_head_chunk={attn_hc}")
    if quant:
        from moviigen_tpu.ops.quantization import device_init_quantized_wan

        params = device_init_quantized_wan(
            0, cfg, bits=4 if quant == "int4" else 8,
            act8=quant == "w8a8")
    else:
        params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    _log("params initialized on device")
    rope = rope_3d_freqs(grid, cfg.head_dim)

    # CFG pairing: batched (B=2) is ~1.9x per step where activations
    # fit; at long sequence the doubled activation footprint is what
    # OOMs a 16 GB chip, so cond/uncond run sequentially (B=1) — the
    # reference always runs them sequentially (text2video.py:240-243).
    cfg_batched = 2 * 2 * tokens * (3 * cfg.dim) <= (1 << 30)

    rdt = jnp.dtype(residual_dtype)

    def denoise_step(params, x, t, ctx):
        if cfg_batched:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            pred = wan_model.forward(params, x2, t2, ctx, cfg, rope,
                                     attn_backend="pallas",
                                     residual_dtype=rdt)
            return pred[1:] + 5.0 * (pred[:1] - pred[1:])
        cond = wan_model.forward(params, x, t, ctx[:1], cfg, rope,
                                 attn_backend="pallas", residual_dtype=rdt)
        uncond = wan_model.forward(params, x, t, ctx[1:], cfg, rope,
                                   attn_backend="pallas", residual_dtype=rdt)
        return uncond + 5.0 * (cond - uncond)

    x = jnp.asarray(np.random.default_rng(0).standard_normal(lat_shape),
                    jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    ctx = jnp.zeros((2, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    trivial = jax.jit(lambda v: jnp.sum(v))
    float(trivial(t))
    t0 = time.perf_counter()
    for _ in range(3):
        float(trivial(t))
    overhead = (time.perf_counter() - t0) / 3

    if cfg_batched:
        # chained iterations inside one jit + scalar readback: robust
        # against async-dispatch timing artifacts (block_until_ready is
        # unreliable through the remote-TPU relay). At long sequences
        # (≥40k tokens) the loop-carry double buffering pushes a
        # memory-marginal step over the HBM edge and the per-dispatch
        # overhead (~40 ms) is noise against a tens-of-seconds step —
        # time a single bare step instead.
        n_iter = 3 if tokens < 40_000 and task != "t2v-14B" else 1

        if n_iter == 1:
            @jax.jit
            def chain(params, x, t, ctx):
                return jnp.sum(denoise_step(params, x, t, ctx))
        else:
            @jax.jit
            def chain(params, x, t, ctx):
                def body(i, acc):
                    return denoise_step(params, acc, t, ctx) \
                        * jnp.float32(0.999)

                out = jax.lax.fori_loop(0, n_iter, body, x)
                return jnp.sum(out)

        _log("compiling CFG step (batched pair)")
        float(chain(params, x, t, ctx))  # compile + warmup
        _log("compiled + warm; measuring")
        t0 = time.perf_counter()
        float(chain(params, x, t, ctx))
        sec_per_step = (time.perf_counter() - t0 - overhead) / n_iter
    else:
        # sequential CFG: the jitted unit is ONE B=1 forward; cond and
        # uncond are two dispatches of the same compiled program (at 14B
        # 75.6k tokens one compile is ~16 min through the remote compile
        # helper — a fused two-forward program would double that and has
        # crashed the worker)
        @jax.jit
        def fwd1(params, x, t, c):
            return jnp.sum(wan_model.forward(
                params, x, t, c, cfg, rope, attn_backend="pallas",
                residual_dtype=rdt).astype(jnp.float32))

        ctx1 = ctx[:1]
        _log("compiling single forward (sequential CFG)")
        float(fwd1(params, x, t, ctx1))  # compile + warmup
        _log("compiled + warm; measuring 2 forwards (one CFG step)")
        t0 = time.perf_counter()
        float(fwd1(params, x, t, ctx1))
        float(fwd1(params, x, t, ctx1))
        sec_per_step = time.perf_counter() - t0 - 2 * overhead

    # FLOPs per CFG step (2 model evals, MACs×2):
    # - per token: self qkvo 4d² + cross q/o 2d² + ffn 2·d·ffn
    # - per layer: cross k/v over the 512 text tokens only
    # - attention: self QK^T+PV 4·L²·d, cross 4·L·text_len·d
    d, ffn, layers = cfg.dim, cfg.ffn_dim, cfg.num_layers
    per_tok_lin = 6 * d * d + 2 * d * ffn
    flops_lin = 2 * 2 * layers * (
        per_tok_lin * tokens + 2 * d * d * cfg.text_len)
    flops_attn = 2 * 4 * layers * d * (
        tokens * tokens + tokens * cfg.text_len)
    total_flops = flops_lin + flops_attn

    # A100 roofline for the same workload: 312 bf16 TFLOPs at 60% MFU
    a100_sec = total_flops / (312e12 * 0.60)
    vs_baseline = a100_sec / sec_per_step  # >1 == faster than A100 roofline

    chip, peak = _chip_peak(jax.devices()[0].device_kind)
    mfu = total_flops / sec_per_step / peak

    qtag = f"_{quant}" if quant else ""
    rtag = "_res-bf16" if rdt == jnp.bfloat16 else ""
    return {
        "metric": (f"sec_per_cfg_denoise_step_{task}{qtag}_"
                   f"{w}x{h}_{frame_num}f{rtag}"),
        "value": round(sec_per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(vs_baseline, 3),
        "mfu": round(mfu, 3),
        "chip": chip,
        "peak_tflops": round(peak / 1e12),
        "tokens": tokens,
        "note": ("vs_baseline is vs an A100-roofline (312 TFLOPs x 60% "
                 "MFU) for the same FLOPs; this chip's peak is "
                 f"{peak / 312e12:.2f}x A100"),
    }


def _chip_peak(device_kind: str):
    """(chip label, peak dense bf16 FLOP/s) from the PJRT device kind."""
    kind = device_kind.lower()
    table = [
        ("v5 lite", ("v5e-16GB", 197e12)),
        ("v5litepod", ("v5e-16GB", 197e12)),
        ("v6 lite", ("v6e-32GB", 918e12)),
        ("v5p", ("v5p-95GB", 459e12)),
        ("v5", ("v5p-95GB", 459e12)),
        ("v4", ("v4-32GB", 275e12)),
    ]
    for sub, entry in table:
        if sub in kind:
            return entry
    return (device_kind, 197e12)  # conservative default


def _single(argv):
    """Hidden child mode: run exactly one attempt and print the JSON."""
    (task, quant, size, frame_num, ffn_chunk, residual_dtype,
     stream_impl) = argv
    result = run_once(task, quant or None, size, int(frame_num),
                      int(ffn_chunk) if ffn_chunk != "None" else None,
                      residual_dtype=residual_dtype,
                      stream_impl=stream_impl)
    print(json.dumps(result))


def _wait_for_worker(budget_s: int) -> bool:
    """Block until a tiny op completes on the worker, up to budget_s.

    The relay's TPU worker can be restarting ('down': backend init
    UNAVAILABLE) or grinding an orphaned-compile queue ('wedged': ops
    hang) for tens of minutes — observed failure modes that would
    otherwise burn every attempt in the chain before the worker is back.
    Probes run in subprocesses (a failed backend init is sticky for a
    JAX process). Returns False when the budget runs out; attempts
    proceed anyway so a late recovery can still record a metric."""
    from tools.tpu_health import probe

    deadline = time.time() + budget_s
    delay = 60
    while True:
        lat, _, status = probe(timeout_s=300)
        if status == "ok":
            if lat >= 60:
                _log(f"worker degraded (tiny op {lat:.0f}s) — "
                     "proceeding; subprocess timeouts still bound "
                     "each attempt")
            return True
        remaining = deadline - time.time()
        _log(f"worker {status}; {remaining:.0f}s of health-wait left")
        if remaining < delay:
            return False
        time.sleep(delay)
        delay = min(delay * 2, 600)


def main(argv=None):
    import argparse
    import subprocess

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default=None,
                    help="WxH preset: 1280*720 (default for the 14B — "
                         "the BASELINE north-star 720P workload), "
                         "480*832, 1920*832")
    ap.add_argument("--frame_num", type=int, default=81)
    ap.add_argument("--ffn_chunk", type=int, default=None,
                    help="stream tokens through the FFN in chunks "
                         "(needed for 131k-token 1080p on 16 GB)")
    ap.add_argument("--task", default=None,
                    help="override the HBM-based config auto-select "
                         "(e.g. t2v-14B with --quant int4 on 16 GB)")
    ap.add_argument("--quant", default=None,
                    choices=["int8", "int4", "w8a8"],
                    help="weight-only quantized params; int4 fits the "
                         "14B flagship on one 16 GB chip (24.2 s/step "
                         "measured at the default workload)")
    ap.add_argument("--attempt_timeout", type=int, default=2400,
                    help="seconds before an attempt is killed and "
                         "the fallback config runs")
    ap.add_argument("--residual_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 halves residual-stream HBM (<1%% "
                         "parity impact measured at 1.3B) — the knob "
                         "that fits 131k-token 1080P-81f on 16 GB")
    ap.add_argument("--health_wait", type=int, default=1500,
                    help="seconds to wait for the TPU worker to answer "
                         "a tiny op before starting attempts (0 = off)")
    ap.add_argument("--stream_impl", default="unroll",
                    choices=["fori", "unroll"],
                    help="loop impl for the streamed-attention paths "
                         "(long sequences only): 'unroll' is the "
                         "execute-proven form on axon-v5e; 'fori' "
                         "faults that worker (r3 bisect)")
    ap.add_argument("--_single", nargs=7, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args._single is not None:
        return _single(args._single)

    if args.health_wait:
        _wait_for_worker(args.health_wait)

    # HBM query in a subprocess with a timeout: against a wedged worker
    # an in-process jax.devices() HANGS (not raises), which would stall
    # the whole bench before the first attempt. Unknown HBM selects the
    # conservative small-chip defaults.
    hbm_gb = None
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, '/root/repo'); import jax; "
             "s = jax.devices()[0].memory_stats() or {}; "
             "print(s.get('bytes_limit', 0))"],
            capture_output=True, text=True, timeout=180)
        if proc.returncode == 0:
            limit = float(proc.stdout.strip().splitlines()[-1])
            if limit:
                hbm_gb = limit / 1e9
    except Exception:
        pass
    # The flagship 14B is the headline everywhere: bf16 on big-HBM
    # parts, int4 weight-only (8.3 GB, same ~137 TF/s effective) on a
    # 16 GB v5e. --task t2v-1.3B benches the small config in bf16;
    # int8/w8a8 weights for the 14B (14.9 GB) leave no activation room
    # at 81f on 16 GB, so those modes also default to the 1.3B.
    big = hbm_gb is not None and hbm_gb > 40
    explicit = args.task is not None
    task = args.task or ("t2v-1.3B"
                         if args.quant in ("w8a8", "int8") and not big
                         else "t2v-14B")
    quant = args.quant
    if task == "t2v-14B" and not big and quant is None:
        quant = "int4"

    # Attempt chain. Default (no explicit task/size): the BASELINE
    # north-star first — 14B @ 1280x720x81f (75.6k tokens, the config
    # the reference runs 4-GPU USP for, inference.sh:1-11) — falling
    # back to 14B @ 480x832 and then the 1.3B operating point so a
    # degraded worker still records a metric.
    if args.size is not None:
        attempts = [(task, quant, args.size)]
        if not explicit and (task, quant) != ("t2v-1.3B", None):
            attempts.append(("t2v-1.3B",
                             args.quant if args.quant in ("w8a8", "int8")
                             else None, args.size))
    elif explicit:
        attempts = [(task, quant,
                     "1280*720" if task == "t2v-14B" else "480*832")]
    else:
        attempts = [(task, quant, "1280*720"),
                    (task, quant, "480*832"),
                    ("t2v-1.3B", args.quant
                     if args.quant in ("w8a8", "int8") else None,
                     "480*832")] if task == "t2v-14B" else \
                   [(task, quant, "480*832")]

    # each attempt runs in a subprocess: SIGALRM cannot interrupt a hang
    # inside a native relay call, but the parent CAN kill the child —
    # and a dead child's device memory is released for the fallback
    last_err = None
    for t, q, size in attempts:
        cmd = [sys.executable, __file__,
               "--_single", t, q or "", size, str(args.frame_num),
               str(args.ffn_chunk), args.residual_dtype,
               args.stream_impl]
        # one retry when the worker itself died mid-attempt (the relay's
        # TPU process crashes/restarts occasionally; that error says
        # nothing about whether the workload fits) — but not for OOM or
        # program errors, which are deterministic.
        for attempt_try in range(2):
            try:
                proc = subprocess.run(
                    cmd, timeout=args.attempt_timeout,
                    capture_output=True, text=True)
                if proc.returncode == 0 and proc.stdout.strip():
                    print(proc.stdout.strip().splitlines()[-1])
                    return
                tail = (proc.stderr or "").strip().splitlines()[-1:]
                last_err = tail[0] if tail else f"rc={proc.returncode}"
            except subprocess.TimeoutExpired:
                last_err = f"timeout after {args.attempt_timeout}s"
            transient = ("UNAVAILABLE" in last_err
                         or "crashed or restarted" in last_err)
            if not (transient and attempt_try == 0):
                break
            print(f"bench attempt ({t}, {q}, {size}) hit a worker "
                  f"crash; retrying once: {last_err}", file=sys.stderr)
            # wait for the restarted worker to actually answer (a fixed
            # sleep burns the retry when the restart takes longer)
            _wait_for_worker(600)
        print(f"bench attempt ({t}, {q}, {size}) failed: {last_err}",
              file=sys.stderr)
        time.sleep(30)  # let the relay free the dead child's memory
    raise SystemExit(f"all bench attempts failed: {last_err}")


if __name__ == "__main__":
    main()
