"""Capture a jax.profiler trace of ONE DiT forward and attribute time
to ops (VERDICT r3 item 7: replace the estimated step-time breakdown in
docs/performance.md with measured op attribution).

Flow: build params at an explicit serving config (same knobs as
fwd_probe.py), compile+warm the forward, then trace exactly one warm
execution and aggregate the XLA device plane's event durations by op,
rolled up into categories (flash-attention kernel, GEMM, convolution,
elementwise/fusion, ...).

The xplane.pb produced by jax.profiler is parsed directly with the
XSpace proto that ships inside tensorflow (tensorboard-plugin-profile's
converter is ABI-incompatible with the installed TF). Parsing runs in
THIS process after stop_trace; PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION
must be pure-python before any protobuf import (the generated
xplane_pb2 predates the installed C++ descriptor pool).

    python tools/profile_step.py --task t2v-1.3B --size 480*832 \
        --frames 81 --quant none --top 25

Whether the remote axon PJRT plugin exports a device plane is
environment-dependent: when only host planes are present the tool says
so and prints the host-side XLA launch line instead of silently
attributing nothing.
"""

import argparse
import collections
import dataclasses
import glob
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, "/root/repo")


def log(msg):
    print(f"[profile {time.strftime('%H:%M:%S')}] {msg}", flush=True)


# category rules, first match wins (op names are XLA HLO/Mosaic names)
_CATEGORIES = (
    ("flash-attention (pallas)", ("flash", "mha", "attn_fwd")),
    ("int8/int4 gemm (pallas)", ("int8_gemm", "w8a8")),
    ("gemm", ("dot_general", "dot.", "gemm", "matmul")),
    ("convolution", ("conv",)),
    ("collective", ("all-reduce", "all-gather", "reduce-scatter",
                    "collective", "ppermute", "all-to-all")),
    ("copy/layout", ("copy", "transpose", "bitcast", "reshape",
                     "dynamic-update", "dynamic_update", "dynamic-slice",
                     "dynamic_slice", "pad", "slice", "concatenate",
                     "gather", "scatter")),
    ("fusion/elementwise", ("fusion", "loop_", "input_", "output_",
                            "tanh", "exp", "add", "mul", "rsqrt",
                            "convert", "select", "broadcast", "reduce",
                            "custom-call", "custom_call")),
)


def _categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in _CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def parse_xspace(logdir: str, top: int):
    """Aggregate (name -> total_ps) per plane from every xplane.pb under
    logdir; returns {plane_name: ordered [(name, ms)]}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no xplane.pb under {logdir}")
    planes = {}
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for p in xs.planes:
            acc = planes.setdefault(p.name, collections.Counter())
            for ln in p.lines:
                if ln.name == "python":  # python frames, not XLA ops
                    continue
                for ev in ln.events:
                    meta = p.event_metadata[ev.metadata_id]
                    if meta.name.startswith("$"):  # source refs
                        continue
                    acc[meta.name] += ev.duration_ps
    return planes


def report(planes, top: int, out=sys.stdout):
    dev_planes = {n: c for n, c in planes.items()
                  if ("TPU" in n or "device" in n.lower() or "GPU" in n)
                  and "metadata" not in n.lower() and sum(c.values())}
    if not dev_planes:
        print("NO DEVICE PLANE captured (plugin exports host planes "
              "only); host-side views:", file=out)
        dev_planes = {n: c for n, c in planes.items() if sum(c.values())}
    for name, acc in dev_planes.items():
        total_ps = sum(acc.values())
        print(f"\n== plane {name}: {total_ps / 1e9:.1f} ms of events ==",
              file=out)
        cats = collections.Counter()
        for op, ps in acc.items():
            cats[_categorize(op)] += ps
        print("-- category rollup --", file=out)
        for cat, ps in cats.most_common():
            print(f"  {ps / 1e9:12.2f} ms  {100 * ps / total_ps:5.1f}%  "
                  f"{cat}", file=out)
        print(f"-- top {top} ops --", file=out)
        for op, ps in acc.most_common(top):
            print(f"  {ps / 1e9:12.2f} ms  {100 * ps / total_ps:5.1f}%  "
                  f"{op[:90]}", file=out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="t2v-1.3B")
    ap.add_argument("--size", default="480*832")
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--quant", default="none",
                    choices=["int4", "int8", "none"])
    ap.add_argument("--residual_dtype", default="float32")
    ap.add_argument("--attn_head_chunk", type=int, default=None)
    ap.add_argument("--cross_attn_chunk", type=int, default=None)
    ap.add_argument("--ffn_chunk", type=int, default=None)
    ap.add_argument("--stream_impl", default="fori",
                    choices=["fori", "unroll"])
    ap.add_argument("--attn_backend", default="pallas")
    ap.add_argument("--logdir", default="/tmp/moviigen_trace")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--parse_only", action="store_true",
                    help="re-parse an existing --logdir, no device work")
    args = ap.parse_args()

    if args.parse_only:
        report(parse_xspace(args.logdir, args.top), args.top)
        return

    import numpy as np
    import jax
    import jax.numpy as jnp

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
                              stream_impl=args.stream_impl)
    w, h = (int(v) for v in args.size.split("*"))
    fp = (args.frames - 1) // 4 + 1
    grid = (fp, h // 8 // 2, w // 8 // 2)
    tokens = grid[0] * grid[1] * grid[2]
    log(f"{args.task} {args.quant} {w}x{h}x{args.frames}f tokens={tokens}")

    if args.quant != "none":
        from moviigen_tpu.ops.quantization import device_init_quantized_wan

        params = device_init_quantized_wan(
            0, cfg, bits=4 if args.quant == "int4" else 8)
    else:
        params = wan_model.init_params(jax.random.PRNGKey(0), cfg,
                                       dtype=jnp.bfloat16)
    jax.block_until_ready(params)
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

    log("compile+warm")
    t0 = time.perf_counter()
    float(fwd1(params, x, t, c))
    log(f"warm in {time.perf_counter() - t0:.1f}s; tracing one step")

    import shutil

    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    float(fwd1(params, x, t, c))
    step_s = time.perf_counter() - t0
    jax.profiler.stop_trace()
    log(f"traced step: {step_s:.2f}s wall; parsing {args.logdir}")

    report(parse_xspace(args.logdir, args.top), args.top)


if __name__ == "__main__":
    main()
