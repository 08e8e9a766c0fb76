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

# Env vars that signal a multi-host launch. Order matters only for the
# log message; any one of them triggers initialization.
_MULTI_HOST_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_ID",
)


def detect_multi_host_env() -> list:
    """The subset of multi-host launcher env vars present (empty on a
    single-host launch)."""
    return [k for k in _MULTI_HOST_ENV_VARS if os.environ.get(k)]


def maybe_initialize_distributed(force: bool = False,
                                 strict: bool = False) -> bool:
    """Initialize jax.distributed when running multi-host (or forced).

    Heuristics: explicit JAX coordinator env, TPU pod env vars, or
    ``force``. Safe to call multiple times.

    Failure semantics: in a detected multi-host environment a failed
    initialize means every process would silently train on its OWN
    devices with its OWN data — a divergent fleet, not a crash. That
    failure is loud (logging.error naming the trigger vars) and, with
    ``strict=True`` (or env MOVIIGEN_STRICT_DISTRIBUTED=1), fatal.
    """
    import jax

    already = getattr(
        jax._src.distributed.global_state, "client", None) is not None
    if already:
        return True
    triggers = detect_multi_host_env()
    if not (force or triggers):
        return False
    strict = strict or os.environ.get(
        "MOVIIGEN_STRICT_DISTRIBUTED", "") not in ("", "0", "false")
    try:
        jax.distributed.initialize()
        logging.info("jax.distributed initialized: process %d/%d, %d "
                     "local / %d global devices",
                     jax.process_index(), jax.process_count(),
                     jax.local_device_count(), jax.device_count())
        return True
    except Exception as e:
        msg = (f"jax.distributed.initialize FAILED in a multi-host "
               f"environment (triggered by {triggers or ['force']}): {e}."
               f" Continuing single-host would run every process on its "
               f"own devices with its own data — a silently divergent "
               f"fleet. Set MOVIIGEN_STRICT_DISTRIBUTED=1 to make this "
               f"fatal.")
        if strict:
            raise RuntimeError(msg) from e
        logging.error(msg)
        return False
