"""Execute ONE DiT forward on the chip at an explicit serving config.

Unlike bench.py (which auto-derives chunk flags from the workload) this
forces every knob, so streamed paths can be exercised at small, safe
sizes — e.g. the in-place stage streams + streamed o-projection at
720P where the unstreamed path is known-good:

    python tools/fwd_probe.py --size 1280*720 --frames 81 --quant int4 \
        --residual_dtype bfloat16 --attn_head_chunk 8 \
        --cross_attn_chunk 16384 --ffn_chunk 16384

Prints stage timestamps (params / compile / execute) so a worker crash
is attributable to a stage, and the step time + effective TF/s.
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def log(msg):
    print(f"[fwd_probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-14B")
    ap.add_argument("--size", default="1280*720")
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--quant", default="int4",
                    choices=["int4", "int8", "none"])
    ap.add_argument("--residual_dtype", default="bfloat16")
    ap.add_argument("--attn_head_chunk", type=int, default=None)
    ap.add_argument("--cross_attn_chunk", type=int, default=None)
    ap.add_argument("--attn_o_chunk", type=int, default=None,
                    help="token-chunk for the streamed o-projection "
                         "residual update (None = whole-L plain adds, "
                         "the DUS-free form)")
    ap.add_argument("--ffn_chunk", type=int, default=None)
    ap.add_argument("--no_attn_o_stream", action="store_true",
                    help="head-chunked accumulator + whole o-projection "
                         "instead of the streamed o (bisect knob)")
    ap.add_argument("--stream_impl", default="fori",
                    choices=["fori", "unroll"],
                    help="streamed-path loop implementation: 'unroll' "
                         "replaces fori_loop + dynamic slices with "
                         "python loops + static slices (crash bisect)")
    ap.add_argument("--attn_bwd_chunk", type=int, default=None,
                    help="scan-based q-token-chunked self-attention "
                         "(lax.scan + stacked outputs — the construct "
                         "the proven block scan uses; no fori/DUS)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--attn_backend", default="pallas",
                    help="'xla' for CPU smoke runs")
    args = ap.parse_args()

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    cfg = WAN_CONFIGS[args.task].model
    cfg = dataclasses.replace(cfg, ffn_chunk=args.ffn_chunk,
                              attn_head_chunk=args.attn_head_chunk,
                              cross_attn_chunk=args.cross_attn_chunk,
                              attn_o_stream=not args.no_attn_o_stream,
                              attn_o_chunk=args.attn_o_chunk,
                              stream_impl=args.stream_impl,
                              attn_bwd_chunk=args.attn_bwd_chunk)
    w, h = (int(v) for v in args.size.split("*"))
    fp = (args.frames - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    log(f"{args.task} {args.quant} {w}x{h}x{args.frames}f "
        f"tokens={tokens} hc={cfg.attn_head_chunk} "
        f"cross={cfg.cross_attn_chunk} ffn={cfg.ffn_chunk} "
        f"qchunk={cfg.attn_bwd_chunk} "
        f"rdt={args.residual_dtype} impl={cfg.stream_impl}")

    if args.quant != "none":
        from moviigen_tpu.ops.quantization import device_init_quantized_wan

        params = device_init_quantized_wan(
            0, cfg, bits=4 if args.quant == "int4" else 8)
    else:
        params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    log("params on device")

    rope = rope_3d_freqs(grid, cfg.head_dim)
    rdt = jnp.dtype(args.residual_dtype)

    @jax.jit
    def fwd1(params, x, t, c):
        return jnp.sum(wan_model.forward(
            params, x, t, c, cfg, rope, attn_backend=args.attn_backend,
            residual_dtype=rdt).astype(jnp.float32))

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.in_dim, fp, h // 8, w // 8)), jnp.float32)
    t = jnp.asarray([500.0], jnp.float32)
    c = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)

    log("compile+warm forward")
    t0 = time.perf_counter()
    val = float(fwd1(params, x, t, c))
    log(f"compiled+executed in {time.perf_counter() - t0:.1f}s "
        f"out={val:.4e}")
    for i in range(args.repeats):
        t0 = time.perf_counter()
        float(fwd1(params, x, t, c))
        sec = time.perf_counter() - t0
        d, ffn, layers = cfg.dim, cfg.ffn_dim, cfg.num_layers
        flops = 2 * layers * ((6 * d * d + 2 * d * ffn) * tokens
                              + 2 * d * d * cfg.text_len) \
            + 4 * layers * d * (tokens * tokens + tokens * cfg.text_len)
        log(f"forward {i + 1}: {sec:.2f}s  {flops / sec / 1e12:.1f} TF/s")


if __name__ == "__main__":
    main()
