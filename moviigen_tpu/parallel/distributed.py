"""Multi-host initialization.

Replaces the reference's torchrun + NCCL env:// bootstrap
(``generate.py:191-207``, ``finetune.py:285``, ``finetune_multi_node.sh``
``$MLP_WORKER_*`` plumbing): on TPU pods ``jax.distributed.initialize()``
discovers the coordinator from the TPU environment automatically; after
it, ``jax.devices()`` spans the whole slice and the (data, seq) mesh code
works unchanged — collectives ride ICI within a slice and DCN across
slices based on mesh layout.
"""

from __future__ import annotations

import logging
import os


def maybe_initialize_distributed(force: bool = False) -> bool:
    """Initialize jax.distributed when running multi-host (or forced).

    Heuristics: explicit JAX coordinator env, TPU pod env vars, or
    ``force``. Safe to call multiple times.
    """
    import jax

    already = getattr(
        jax._src.distributed.global_state, "client", None) is not None
    if already:
        return True
    multi_host_env = any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_ID"))
    if not (force or multi_host_env):
        return False
    try:
        jax.distributed.initialize()
        logging.info("jax.distributed initialized: process %d/%d, %d "
                     "local / %d global devices",
                     jax.process_index(), jax.process_count(),
                     jax.local_device_count(), jax.device_count())
        return True
    except Exception as e:
        logging.warning("jax.distributed.initialize failed: %s", e)
        return False
