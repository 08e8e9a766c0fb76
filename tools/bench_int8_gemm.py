"""Microbenchmark: W8A8 paths vs bf16 at production DiT-linear shapes.

Measures on the current default backend (intended: the real TPU):
  a) bf16 GEMM via XLA (the current serving path after int4/bf16 dequant)
  b) int8 x int8 -> int32 via XLA dot_general (the r1 W8A8 path, 1.1x)
  c) Pallas fused int8 GEMM with dequant epilogue (ops/int8_gemm.py)

Timing per CLAUDE.md: iterations chained inside one jit via fori_loop,
one scalar readback.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, iters=8):
    """Seconds per chained iteration (fn internally runs `iters` steps)."""
    fn_j = jax.jit(fn)
    float(fn_j(*args))  # compile + warm
    t0 = time.perf_counter()
    float(fn_j(*args))
    return (time.perf_counter() - t0) / iters  # per-iteration seconds


def chain(step, iters):
    """step: x -> x (same shape/dtype); returns scalar-reducing chained fn."""
    def run(x, *rest):
        def body(i, acc):
            return step(acc, *rest)
        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(out.astype(jnp.float32))
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=32768)
    ap.add_argument("--k", type=int, default=5120)
    ap.add_argument("--n", type=int, default=5120)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bm", type=int, default=256)
    ap.add_argument("--bn", type=int, default=512)
    ap.add_argument("--bk", type=int, default=512)
    ap.add_argument("--only_pallas", action="store_true",
                    help="skip the bf16/int8-XLA/ceiling rows (block "
                         "sweeps); ratio uses a fixed 121.4 TF/s bf16 ref")
    args = ap.parse_args()
    m, k, n, iters = args.m, args.k, args.n, args.iters
    assert k == n, "chained timing needs square-ish K==N"

    from moviigen_tpu.ops.int8_gemm import int8_gemm_fused
    from moviigen_tpu.ops.quantization import quantize_activations

    rng = np.random.default_rng(0)
    flops = 2 * m * k * n

    xb = jnp.asarray(rng.standard_normal((m, k)) * 0.1, jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n), dtype=np.int8))
    sw = jnp.asarray(rng.uniform(1e-3, 2e-2, (n,)).astype(np.float32))

    if args.only_pallas:
        bf16_tfs = 121.4  # measured on this v5e at the default shape
    else:
        # ---- a) bf16 XLA
        wb = jnp.asarray(rng.standard_normal((k, n)) * 0.02, jnp.bfloat16)

        def step_bf16(x, w):
            return jnp.matmul(x, w)

        sec = timeit(chain(step_bf16, iters), xb, wb, iters=iters)
        bf16_tfs = flops / sec / 1e12
        print(f"bf16 XLA GEMM          {m}x{k}x{n}: {bf16_tfs:7.1f} TF/s")

        # ---- b) int8 XLA (raw dot, rescale outside)
        def step_int8_xla(x, wq, sw):
            xq, sx = quantize_activations(x)
            acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sx * sw[None, :]
                    ).astype(jnp.bfloat16)

        sec = timeit(chain(step_int8_xla, iters), xb, wq, sw, iters=iters)
        xla8_tfs = flops / sec / 1e12
        print(f"int8 XLA + rescale     {m}x{k}x{n}: {xla8_tfs:7.1f} TOP/s "
              f"({xla8_tfs / bf16_tfs:.2f}x bf16)")

    # ---- c) Pallas fused (incl. activation quant, like serving)
    def step_pallas(x, wq, sw):
        xq, sx = quantize_activations(x)
        return int8_gemm_fused(xq, wq, sx, sw, out_dtype=jnp.bfloat16,
                               bm=args.bm, bn=args.bn, bk=args.bk)

    sec = timeit(chain(step_pallas, iters), xb, wq, sw, iters=iters)
    pl_tfs = flops / sec / 1e12
    print(f"Pallas fused W8A8      {m}x{k}x{n}: {pl_tfs:7.1f} TOP/s "
          f"({pl_tfs / bf16_tfs:.2f}x bf16) "
          f"[bm={args.bm} bn={args.bn} bk={args.bk}]")

    if args.only_pallas:
        return

    # ---- d) Pallas GEMM only (pre-quantized activations — kernel ceiling)
    xq0, sx0 = quantize_activations(xb)

    def step_pallas_raw(xq, wq, sx, sw):
        out = int8_gemm_fused(xq, wq, sx, sw, out_dtype=jnp.bfloat16,
                              bm=args.bm, bn=args.bn, bk=args.bk)
        # feed output back as int8 to keep the chain shape-stable
        return (out.astype(jnp.float32) * 12.7).astype(jnp.int8)

    def run_raw(xq, wq, sx, sw):
        def body(i, acc):
            return step_pallas_raw(acc, wq, sx, sw)
        out = jax.lax.fori_loop(0, iters, body, xq)
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(run_raw)
    float(fn(xq0, wq, sx0, sw))
    t0 = time.perf_counter()
    float(fn(xq0, wq, sx0, sw))
    sec = time.perf_counter() - t0
    raw_tfs = flops / (sec / iters) / 1e12
    print(f"Pallas GEMM-only ceil  {m}x{k}x{n}: {raw_tfs:7.1f} TOP/s "
          f"({raw_tfs / bf16_tfs:.2f}x bf16)")


if __name__ == "__main__":
    main()
