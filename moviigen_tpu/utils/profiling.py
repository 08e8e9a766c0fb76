"""Profiling / tracing utilities.

Parity: the reference's manual phase timing with cuda.synchronize around
prep/forward/loss/optimizer (``finetune.py:190-263``, ``timing_stats``)
and TensorBoard ``time/*`` scalars. TPU-native upgrades:

- ``jax.profiler`` trace capture (XLA op-level profiles come free — the
  reference had no torch.profiler integration at all);
- a phase timer that synchronizes via scalar readback (robust against
  async dispatch, including remote-TPU relays where
  ``block_until_ready`` can return early).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def enable_persistent_compilation_cache(
        path: str = "/root/repo/.jax_cache") -> None:
    """Persist compiled executables across processes.

    The environment's compiles go through a remote compile helper that
    can be slow or wedged when the TPU worker is degraded; a local
    on-disk cache makes every previously-compiled program load without
    touching it. Harmless if the backend can't serialize executables
    (cache misses fall through to normal compilation)."""
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT entries embed machine features that can mismatch
            # across feature-detection runs (SIGILL risk) and CPU
            # compiles are fast anyway — cache only device backends
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # unknown flags on older jax — best-effort
        pass


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree=None) -> None:
    """Synchronize with device completion. With a pytree argument, forces
    a scalar readback of one leaf (reliable everywhere); otherwise blocks
    on all live arrays."""
    if tree is None:
        (jax.effects_barrier if hasattr(jax, "effects_barrier")
         else lambda: None)()
        return
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        first = leaves[0]
        jnp.asarray(first).reshape(-1)[0].item()


class PhaseTimer:
    """Accumulates per-phase wall-clock stats (ref ``timing_stats``)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_tree=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        yield
        if sync_tree is not None:
            sync(sync_tree)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def averages(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(1, self.counts[k])
                for k in self.totals}

    def report(self) -> str:
        return " ".join(f"{k}={v * 1e3:.1f}ms"
                        for k, v in sorted(self.averages().items()))
