"""Streaming VAE decode: time vs chunk_frames (latent frames per scan
step).

The reference decodes strictly one latent frame per cache step
(vae.py:552-566); our cache math is exact for any chunk size, so larger
chunks amortize the many small convs — bounded by the full-resolution
activation footprint (chunk*4 output frames live at once). This
measures the curve so the auto heuristic in
models/vae_streaming.py:decode_streaming is evidence-based.

Usage:
    python tools/bench_vae_chunks.py                 # 480x832x81f
    python tools/bench_vae_chunks.py --h 720 --w 1280 --chunks 1 2
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from moviigen_tpu.configs import VAEConfig  # noqa: E402
from moviigen_tpu.models import vae as vaem  # noqa: E402
from moviigen_tpu.models.vae_streaming import decode_streaming  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=832)
    ap.add_argument("--frames", type=int, default=81)
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[1, 2, 4, 5, 10])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dim", type=int, default=96,
                    help="VAE base dim (small values for CPU smoke)")
    args = ap.parse_args()

    cfg = VAEConfig(dim=args.dim)
    tl = (args.frames - 1) // 4 + 1
    hl, wl = args.h // 8, args.w // 8
    dt = jnp.dtype(args.dtype)

    print(f"init VAE params (dim={cfg.dim})...", flush=True)
    params = vaem.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: a.astype(dt)
                          if a.dtype == jnp.float32 else a, params)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.z_dim, tl, hl, wl)) * 0.5, dt)

    for c in args.chunks:
        if (tl - 1) % c:
            print(f"chunk={c:3d}: skipped (does not divide T'-1={tl - 1})")
            continue
        fn = jax.jit(lambda p, zz, c=c: jnp.sum(
            decode_streaming(p, zz, cfg, chunk_frames=c)
            .astype(jnp.float32)))
        try:
            float(fn(params, z))  # compile + warm
            t0 = time.perf_counter()
            float(fn(params, z))
            sec = time.perf_counter() - t0
        except Exception as e:
            print(f"chunk={c:3d}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)
            continue
        print(f"chunk={c:3d}: {sec:6.2f} s "
              f"({args.frames}f {args.h}x{args.w} {args.dtype})",
              flush=True)


if __name__ == "__main__":
    main()
