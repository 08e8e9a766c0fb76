"""TPU worker health probe with backoff — ops tool for the axon relay.

The remote worker behind the relay degrades when clients crash or are
killed mid-compile: orphaned compiles keep grinding server-side, leaked
session memory reclaims lazily, and until the queue drains even a tiny
op can take minutes. This tool measures that state without making it
worse:

    python tools/tpu_health.py            # one probe round
    python tools/tpu_health.py --wait     # poll until healthy (backoff)

Each probe runs in its own subprocess: a failed/hung backend init is
sticky for a JAX process, so in-process retries would report the first
failure forever. A probe that errors ("down", e.g. worker restarting)
or exceeds --probe_timeout ("wedged") counts as unhealthy and the
waiter keeps polling. Probe rounds are strictly ordered smallest-first
so an unhealthy worker is touched as lightly as possible.
"""

import argparse
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

_PROBE_SRC = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((64, 64))
float(x.sum())
print(f"LAT {time.time() - t0:.3f}", flush=True)
alloc_gb = int(sys.argv[1]) if len(sys.argv) > 1 else 0
if alloc_gb:
    bufs = []
    try:
        for _ in range(alloc_gb):
            bufs.append(jnp.ones((1 << 28,), jnp.float32))
            float(bufs[0][0])
        print(f"ALLOC {alloc_gb}", flush=True)
    except Exception:
        print(f"ALLOC {len(bufs)}", flush=True)
"""


def probe(alloc_gb: int = 0, timeout_s: float = 600.0):
    """Returns (latency_s or None, allocatable_gb or None, status_word).

    latency None means the probe never completed: 'down' (backend init
    error — worker unreachable/restarting) or 'wedged' (timed out)."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC, str(alloc_gb)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, None, "wedged"
    lat = free = None
    for line in proc.stdout.splitlines():
        if line.startswith("LAT "):
            lat = float(line.split()[1])
        elif line.startswith("ALLOC "):
            free = int(line.split()[1])
    if proc.returncode != 0 or lat is None:
        return None, None, "down"
    return lat, free, "ok"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait", action="store_true",
                    help="poll with backoff until the tiny-op latency "
                         "drops under --healthy_s")
    ap.add_argument("--healthy_s", type=float, default=5.0)
    ap.add_argument("--probe_timeout", type=float, default=600.0)
    ap.add_argument("--alloc_gb", type=int, default=0,
                    help="additionally measure allocatable HBM (GB); "
                         "touches the allocator, use sparingly")
    args = ap.parse_args(argv)

    delay = 60
    while True:
        lat, free, status = probe(args.alloc_gb, args.probe_timeout)
        if lat is None:
            msg = f"probe {status} (no tiny-op completion)"
            healthy = False
        else:
            healthy = lat < args.healthy_s
            msg = (f"tiny-op latency {lat:.1f}s -> "
                   f"{'healthy' if healthy else 'degraded'}")
        if free is not None:
            msg += f"; allocatable >= {free} GB"
        print(msg, flush=True)
        if not args.wait or healthy:
            return 0 if healthy else 1
        time.sleep(delay)
        delay = min(delay * 2, 900)


if __name__ == "__main__":
    raise SystemExit(main())
