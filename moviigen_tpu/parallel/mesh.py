"""Device mesh construction.

Replaces the reference's NCCL process-group bootstrap
(``generate.py:201-229``, ``finetune.py:285-289``, xfuser
``initialize_model_parallel`` and FastVideo ``nccl_info`` state) with a
single ``jax.sharding.Mesh``:

- ``data``: data parallelism (the reference's SP-group-as-DP-unit);
- ``seq``:  sequence parallelism (Ulysses/ring ≡ all_to_all/ppermute
  over this axis) — also the param-shard (FSDP) axis, matching the
  reference which shards FSDP over the same ranks as SP.

On multi-host TPU pods, call ``jax.distributed.initialize()`` before
building the mesh; XLA routes ``seq`` collectives over ICI when the axis
is laid out within a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, seq: int = 1, ring: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, seq) — or, with ``ring > 1``, (data, ring, seq) —
    mesh over the available devices.

    The 3-axis form backs the hybrid Ulysses×Ring mode (the reference's
    ``--ulysses_size U --ring_size R`` with both > 1): ``seq`` is the
    Ulysses (head all_to_all) axis and ``ring`` the KV-rotation axis.
    ``ring`` is placed outer so each ring block's tokens are contiguous
    and its Ulysses group is ICI-adjacent.
    """
    if devices is None:
        devices = jax.devices()
    n = data * seq * ring
    if n > len(devices):
        raise ValueError(
            f"mesh {data}x{ring}x{seq} needs {n} devices, "
            f"have {len(devices)}")
    if ring > 1:
        dev = np.asarray(devices[:n]).reshape(data, ring, seq)
        return Mesh(dev, axis_names=("data", "ring", "seq"))
    dev = np.asarray(devices[:n]).reshape(data, seq)
    return Mesh(dev, axis_names=("data", "seq"))


def mesh_axis_size(mesh: Optional[Mesh], axis: str) -> int:
    if mesh is None or axis not in mesh.shape:
        return 1
    return mesh.shape[axis]


def make_pod_mesh(data: int = 1, seq: int = 1, ring: int = 1,
                  num_slices: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """Multi-slice (DCN-aware) mesh for multi-pod TPU deployments.

    The ``data`` axis spans slices over DCN (slow inter-pod links carry
    only data-parallel gradient traffic); ``ring``/``seq`` collectives
    (all_to_all / ppermute every block) stay within a slice on ICI.
    This is the layout rule from the reference's multi-node setup
    (``finetune_multi_node.sh``: nodes are DP, GPUs within a node are SP)
    restated for TPU pod slices.

    With one slice (or non-TPU devices) this degrades to ``make_mesh``.
    """
    if devices is None:
        devices = jax.devices()
    if num_slices is None:
        num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if num_slices <= 1:
        return make_mesh(data=data, seq=seq, ring=ring, devices=devices)
    if data % num_slices != 0:
        raise ValueError(
            f"data axis {data} must be a multiple of num_slices "
            f"{num_slices} (each slice carries data/num_slices DP ranks)")
    from jax.experimental import mesh_utils

    if ring > 1:
        mesh_shape = (data // num_slices, ring, seq)
        dcn_shape = (num_slices, 1, 1)
        names = ("data", "ring", "seq")
    else:
        mesh_shape = (data // num_slices, seq)
        dcn_shape = (num_slices, 1)
        names = ("data", "seq")
    dev = mesh_utils.create_hybrid_device_mesh(
        mesh_shape, dcn_shape, devices=devices)
    return Mesh(dev, axis_names=names)
