"""AOT-compile the 14B B=1 forward at a given workload and print XLA's
buffer-assignment memory analysis — without initializing params on the
device (abstract lowering), so a too-big program can't kill the worker
with a real allocation.

Usage:
    python tools/mem_probe.py --size 1920*832 --frames 61 \
        --quant int4 --residual_dtype bfloat16 [--attn_head_chunk 8]
"""

import argparse
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-14B")
    ap.add_argument("--size", default="1920*832")
    ap.add_argument("--frames", type=int, default=61)
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--residual_dtype", default="bfloat16")
    ap.add_argument("--attn_head_chunk", type=int, default=None)
    ap.add_argument("--cross_attn_chunk", type=int, default=None)
    ap.add_argument("--attn_o_chunk", type=int, default=None,
                    help="token-chunk for the streamed o-projection "
                         "residual update (None = whole-L plain adds, "
                         "the DUS-free form)")
    ap.add_argument("--ffn_chunk", type=int, default=16384)
    ap.add_argument("--no_attn_o_stream", action="store_true",
                    help="head-chunked accumulator + whole o-projection "
                         "instead of the streamed o (bisect knob)")
    ap.add_argument("--stream_impl", default="fori",
                    choices=["fori", "unroll"])
    ap.add_argument("--attn_bwd_chunk", type=int, default=None,
                    help="scan-based q-token-chunked self-attention "
                         "(lax.scan + stacked outputs — the construct "
                         "the proven block scan uses; no fori/DUS)")
    ap.add_argument("--compile", action="store_true",
                    help="run full backend compile (buffer assignment) "
                         "instead of lowering only")
    args = ap.parse_args()

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.ops.quantization import device_init_quantized_wan
    from moviigen_tpu.ops.rope import rope_3d_freqs
    from moviigen_tpu.utils.profiling import \
        enable_persistent_compilation_cache

    # cache the backend compile: a bench/serving jit of the same program
    # then skips the ~20 min remote compile
    enable_persistent_compilation_cache()

    cfg = WAN_CONFIGS[args.task].model
    w, h = (int(v) for v in args.size.split("*"))
    fp = (args.frames - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    cfg = dataclasses.replace(cfg, ffn_chunk=args.ffn_chunk,
                              attn_head_chunk=args.attn_head_chunk,
                              cross_attn_chunk=args.cross_attn_chunk,
                              attn_o_stream=not args.no_attn_o_stream,
                              attn_o_chunk=args.attn_o_chunk,
                              stream_impl=args.stream_impl,
                              attn_bwd_chunk=args.attn_bwd_chunk)
    print(f"tokens={tokens} ffn_chunk={cfg.ffn_chunk} "
          f"attn_head_chunk={cfg.attn_head_chunk} "
          f"cross_attn_chunk={cfg.cross_attn_chunk} "
          f"attn_bwd_chunk={cfg.attn_bwd_chunk}", flush=True)

    if args.quant in ("int4", "int8"):
        params_shapes = jax.eval_shape(
            lambda: device_init_quantized_wan(
                0, cfg, bits=4 if args.quant == "int4" else 8))
    else:
        params_shapes = jax.eval_shape(
            lambda: wan_model.init_params(
                jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16))
    rope = rope_3d_freqs(grid, cfg.head_dim)
    rdt = jnp.dtype(args.residual_dtype)

    def fwd1(params, x, t, c):
        return jnp.sum(wan_model.forward(
            params, x, t, c, cfg, rope, attn_backend="pallas",
            residual_dtype=rdt).astype(jnp.float32))

    x = jax.ShapeDtypeStruct((1, cfg.in_dim, fp, h // 8, w // 8),
                             jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    c = jax.ShapeDtypeStruct((1, cfg.text_len, cfg.text_dim),
                             jnp.bfloat16)
    print("lowering...", flush=True)
    lowered = jax.jit(fwd1).lower(params_shapes, x, t, c)
    print("lowered OK", flush=True)
    if not args.compile:
        return
    print("compiling (backend buffer assignment)...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("compiled OK", flush=True)
    if ma is not None:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                print(f"{k}: {v / 1e9:.3f} GB")


if __name__ == "__main__":
    main()
