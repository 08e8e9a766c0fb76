"""TPU worker health probe with backoff — ops tool for the axon relay.

The remote worker behind the relay degrades when clients crash or are
killed mid-compile: orphaned compiles keep grinding server-side, leaked
session memory reclaims lazily, and until the queue drains even a tiny
op can take minutes. This tool measures that state without making it
worse:

    python tools/tpu_health.py            # one probe round
    python tools/tpu_health.py --wait     # poll until healthy (backoff)

Probe rounds are strictly ordered smallest-first so an unhealthy worker
is touched as lightly as possible. Never Ctrl-C a probe mid-flight if
you can help it — a killed client orphans its in-flight work, which is
exactly the degradation being measured.
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def probe(alloc_gb: int = 0):
    """Returns (latency_s, allocatable_gb or None)."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((64, 64))
    float(x.sum())
    lat = time.time() - t0

    free = None
    if alloc_gb:
        bufs = []
        try:
            for _ in range(alloc_gb):
                bufs.append(jnp.ones((1 << 28,), jnp.float32))
                float(bufs[0][0])
            free = alloc_gb
        except Exception:
            free = len(bufs)
        del bufs
    return lat, free


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", action="store_true",
                    help="poll with backoff until the tiny-op latency "
                         "drops under --healthy_s")
    ap.add_argument("--healthy_s", type=float, default=5.0)
    ap.add_argument("--alloc_gb", type=int, default=0,
                    help="additionally measure allocatable HBM (GB); "
                         "touches the allocator, use sparingly")
    args = ap.parse_args(argv)

    delay = 60
    while True:
        lat, free = probe(args.alloc_gb)
        status = "healthy" if lat < args.healthy_s else "degraded"
        msg = f"tiny-op latency {lat:.1f}s -> {status}"
        if free is not None:
            msg += f"; allocatable >= {free} GB"
        print(msg, flush=True)
        if not args.wait or lat < args.healthy_s:
            return 0 if lat < args.healthy_s else 1
        time.sleep(delay)
        delay = min(delay * 2, 900)


if __name__ == "__main__":
    raise SystemExit(main())
