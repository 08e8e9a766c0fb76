"""Flash-attention block sweep at production sequence lengths.

The 720P/1080P steps are attention-dominated (self-attn is O(L^2) over
75.6k / 131k tokens — wan/text2video.py:164-166 token formula), so the
kernel's block shape matters more at long L than at the 32k the r1
sweep used. This sweeps (block_q, block_k) at the three production
token counts and prints effective TF/s over TRUE (unpadded) FLOPs.

Timing per CLAUDE.md: iterations chained inside one jitted fori_loop,
one scalar readback. The output of flash_attention has q's shape, so
the chain feeds out -> q with fixed k/v.

Usage:
    python tools/bench_flash_sweep.py --seqs 32760 75600 131040 \
        --blocks 512 1024 2048 --iters 4
    python tools/bench_flash_sweep.py --seqs 75600 --bq 1024 --bk 2048
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moviigen_tpu.ops.flash_attention import flash_attention  # noqa: E402


def _dispatch_overhead():
    """Per-dispatch relay overhead (CLAUDE.md: ~30-40 ms here) —
    subtracted from each timed call so short sequences aren't
    under-reported (at 32,760 tokens a call is ~0.2 s/8h: 40 ms of
    relay latency read as a 5-6%% kernel deficit in the r2 sweep)."""
    trivial = jax.jit(lambda v: jnp.sum(v))
    x = jnp.ones((8,), jnp.float32)
    float(trivial(x))
    t0 = time.perf_counter()
    for _ in range(4):
        float(trivial(x))
    return (time.perf_counter() - t0) / 4


def bench_one(l, n_heads, d, bq, bk, iters, heads_per_call,
              overhead=0.0):
    """Seconds per fwd call at [1, l, n_heads, d], timed in chunks of
    heads_per_call heads to bound HBM at 131k tokens. ``iters=None``
    auto-scales so the timed chain runs >=2 s (short sequences need
    many chained iterations to amortize the dispatch)."""
    rng = np.random.default_rng(0)
    nh = heads_per_call
    q = jnp.asarray(rng.standard_normal((1, l, nh, d)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, l, nh, d)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, l, nh, d)) * 0.1, jnp.bfloat16)

    if iters is None:
        est_call = 4 * l * l * d * nh / 120e12  # assume ~120 TF/s
        iters = max(2, min(64, int(round(2.0 / est_call))))

    def run(q0, k0, v0):
        def body(i, acc):
            return flash_attention(acc, k0, v0, block_q=bq, block_k=bk)
        out = jax.lax.fori_loop(0, iters, body, q0)
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(run)
    float(fn(q, k, v))  # compile + warm
    t0 = time.perf_counter()
    float(fn(q, k, v))
    sec_call = (time.perf_counter() - t0 - overhead) / iters
    return sec_call * (n_heads / nh)  # scale to the full head count


def bench_bwd_one(l, n_heads, d, bq, bk, iters, heads_per_call,
                  overhead=0.0):
    """Seconds per BACKWARD call (fused dKV + dQ Pallas kernels) at
    [1, l, nh, d], bypassing the custom-vjp's `_vjp_safe_bk` clamp so
    blocks past the 1024 training cap can be swept (VERDICT r3: the
    backward never had the forward's sweep). Chain: do -> dq feeds the
    next iteration's do; dk/dv stay live via an eps-weighted sum (a
    plain *0 could be strength-reduced away)."""
    from moviigen_tpu.ops.flash_attention import (_flash_bwd,
                                                  flash_attention_with_stats)

    rng = np.random.default_rng(0)
    nh = heads_per_call
    shp = (1, l, nh, d)
    q = jnp.asarray(rng.standard_normal(shp) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shp) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shp) * 0.1, jnp.bfloat16)
    scale = d ** -0.5

    # one forward (stats variant) supplies o/m/l residuals; the stats
    # API returns m in the natural-log domain (ring merging), while
    # _flash_bwd consumes the kernel's base-2 m — convert back
    from moviigen_tpu.ops.flash_attention import LOG2E

    o, m, lse = flash_attention_with_stats(q, k, v, scale=scale)
    m = m * jnp.float32(LOG2E)
    o = jax.block_until_ready(o)

    if iters is None:
        est_call = 10 * l * l * d * nh / 100e12  # assume ~100 TF/s bwd
        iters = max(2, min(32, int(round(2.0 / est_call))))

    # q/k/v/o/m/lse enter as ARGUMENTS (like the fwd sweep): a closure
    # would embed them as ~300 MB of HLO constants, which the remote
    # compile helper rejects with HTTP 413
    def run(do0, q, k, v, o, m, lse):
        def body(i, acc):
            dq, dk, dv = _flash_bwd(q, k, v, None, o, m, lse, acc,
                                    scale, bq, bk)
            return dq + jnp.bfloat16(1e-8) * (jnp.sum(dk) + jnp.sum(dv))
        out = jax.lax.fori_loop(0, iters, body, do0)
        return jnp.sum(out.astype(jnp.float32))

    fn = jax.jit(run)
    float(fn(o, q, k, v, o, m, lse))  # compile + warm (o as do-seed)
    t0 = time.perf_counter()
    float(fn(o, q, k, v, o, m, lse))
    sec_call = (time.perf_counter() - t0 - overhead) / iters
    return sec_call * (n_heads / nh)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, nargs="+",
                    default=[32760, 75600, 131040])
    ap.add_argument("--blocks", type=int, nargs="+",
                    default=[512, 1024, 2048])
    ap.add_argument("--bqs", type=int, nargs="+", default=None,
                    help="query-block list (cross product with --bks); "
                         "only bk must divide L to compile out the "
                         "key-pad mask — bq padding just wastes rows")
    ap.add_argument("--bks", type=int, nargs="+", default=None)
    ap.add_argument("--bq", type=int, default=None)
    ap.add_argument("--bk", type=int, default=None)
    ap.add_argument("--heads", type=int, default=40,
                    help="14B head count (FLOPs scaled to this)")
    ap.add_argument("--heads_per_call", type=int, default=8,
                    help="heads actually resident per timed call")
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--iters", type=int, default=None,
                    help="chained iterations per timed call (default: "
                         "auto-scale so each call runs >=2 s)")
    ap.add_argument("--bwd", action="store_true",
                    help="sweep the fused Pallas BACKWARD (dKV+dQ) "
                         "instead of the forward; TF/s over the "
                         "backward's 10*L^2*d*N true FLOPs")
    args = ap.parse_args()

    if args.bq and args.bk:
        combos = [(args.bq, args.bk)]
    elif args.bqs and args.bks:
        combos = list(itertools.product(args.bqs, args.bks))
    else:
        combos = list(itertools.product(args.blocks, args.blocks))

    overhead = _dispatch_overhead()
    print(f"dispatch overhead {overhead * 1e3:.1f} ms", flush=True)

    bench_fn = bench_bwd_one if args.bwd else bench_one
    for l in args.seqs:
        # fwd: qk + pv (2 matmuls); bwd: dv/dp/ds-included/dq/dk
        # (5 matmuls) -> 10*L^2*d per head
        flops = (10 if args.bwd else 4) * l * l * args.d * args.heads
        best = None
        for bq, bk in combos:
            try:
                sec = bench_fn(l, args.heads, args.d, bq, bk,
                               args.iters, args.heads_per_call,
                               overhead=overhead)
            except Exception as e:  # OOM / untileable
                print(f"L={l:7d} bq={bq:5d} bk={bk:5d}: FAIL "
                      f"{type(e).__name__}: {str(e)[:80]}")
                continue
            tfs = flops / sec / 1e12
            print(f"L={l:7d} bq={bq:5d} bk={bk:5d}: {sec:7.3f} s "
                  f"(x{args.heads}h) {tfs:6.1f} TF/s", flush=True)
            if best is None or tfs > best[0]:
                best = (tfs, bq, bk)
        if best:
            print(f"L={l:7d} BEST: {best[0]:.1f} TF/s "
                  f"at bq={best[1]} bk={best[2]}\n", flush=True)


if __name__ == "__main__":
    main()
