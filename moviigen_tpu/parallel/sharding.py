"""Parameter sharding rules (GSPMD) — the FSDP/TP analog.

Replaces the reference's torch-FSDP wrapper (``wan/distributed/fsdp.py``,
FULL_SHARD per WanAttentionBlock) and FastVideo FSDP kwargs
(``finetune.py:352-361``) with partition specs on the parameter pytree.
XLA then materializes gather/psum collectives where the computation needs
them — no wrapper modules, no process groups.

Default DiT rule set (a Megatron-style within-layer split over the ``seq``
axis, which doubles as the param-shard axis exactly like the reference
shards FSDP over SP ranks):

- attention q/k/v kernels: shard the head (output) dim;
- attention o kernel: shard the input (head) dim → psum after o-proj;
- ffn fc1: shard the hidden dim; fc2: shard the input dim → psum;
- embeddings/norms/modulation: replicated (small).

With ``lax.scan`` over stacked layers this also yields FSDP-style
memory scaling: each leaf carries a leading layer axis and only the
current layer's shards are live per iteration.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _tree_map_with_path(fn, tree, path=()):
    if isinstance(tree, dict):
        return {k: _tree_map_with_path(fn, v, path + (k,))
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        t = [_tree_map_with_path(fn, v, path + (str(i),))
             for i, v in enumerate(tree)]
        return type(tree)(t) if isinstance(tree, tuple) else t
    return fn(path, tree)


def dit_param_specs(params: Dict[str, Any], axis: str = "seq"
                    ) -> Dict[str, Any]:
    """PartitionSpec tree for WanModel params (stacked-layer layout)."""

    quant_mats = ("q", "k", "v", "o", "k_img", "v_img", "fc1", "fc2")

    def spec(path, leaf):
        joined = "/".join(path)
        nd = leaf.ndim
        if "blocks" in path:
            # quantized linears (ops/quantization.py leaves): shard the
            # output (last) dim of codes and scales — FSDP gathers then
            # move int8/packed-int4 bytes, 4-8x cheaper than bf16
            if joined.endswith(("/q8", "/q4")) or (
                    path[-1] == "scale"
                    and len(path) >= 2 and path[-2] in quant_mats):
                return P(*([None] * (nd - 1)), axis)
            # leading axis = layers: never shard (scan carries it)
            if joined.endswith("ffn/fc1/kernel"):
                return P(None, None, axis)       # [L, D, F]
            if joined.endswith("ffn/fc2/kernel"):
                return P(None, axis, None)       # [L, F, D]
            for name in ("self_attn", "cross_attn"):
                if f"{name}/q/kernel" in joined \
                        or f"{name}/k/kernel" in joined \
                        or f"{name}/v/kernel" in joined \
                        or f"{name}/k_img/kernel" in joined \
                        or f"{name}/v_img/kernel" in joined:
                    return P(None, None, axis)   # [L, D, D] out=heads
                if f"{name}/o/kernel" in joined:
                    return P(None, axis, None)   # [L, D, D] in=heads
            return P(*([None] * nd))
        return P(*([None] * nd))

    return _tree_map_with_path(spec, params)


def t5_param_specs(params: Dict[str, Any], axis: str = "seq"
                   ) -> Dict[str, Any]:
    quant_mats = ("q", "k", "v", "o", "gate", "fc1", "fc2")

    def spec(path, leaf):
        joined = "/".join(path)
        nd = leaf.ndim
        if joined == "token_embedding":
            return P(None, None)
        if path and path[0] == "token_embedding":
            # int8 per-row quantized vocab table: shard rows
            return P(axis, *([None] * (nd - 1)))
        if "blocks" in path:
            # quantized leaves (blocks/attn/q/q4 etc.): shard the output
            # (last) dim of codes and scales, same rationale as the DiT
            if joined.endswith(("/q8", "/q4")) or (
                    path[-1] == "scale"
                    and len(path) >= 2 and path[-2] in quant_mats):
                return P(*([None] * (nd - 1)), axis)
            if joined.endswith("attn/q") or joined.endswith("attn/k") \
                    or joined.endswith("attn/v"):
                return P(None, None, axis)
            if joined.endswith("attn/o"):
                return P(None, axis, None)
            if joined.endswith("ffn/gate") or joined.endswith("ffn/fc1"):
                return P(None, None, axis)
            if joined.endswith("ffn/fc2"):
                return P(None, axis, None)
        return P(*([None] * nd))

    return _tree_map_with_path(spec, params)


def opt_state_specs(opt_state, params, param_specs):
    """PartitionSpec tree for an optax state, mirroring param shardings.

    AdamW's ``mu``/``nu`` (and MultiSteps' accumulators) are pytrees
    structurally containing the param tree, so every optimizer leaf
    whose tree-path SUFFIX matches a param's path (and shape) inherits
    that param's spec; everything else (step counters, scalars)
    replicates. This is what keeps fp32 optimizer moments FSDP-sharded
    at 14B scale (2 x 56 GB replicated would never fit a chip) —
    the torch analog is FSDP's sharded optimizer state."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    def keystr(entry):
        for attr in ("key", "name", "idx"):
            if hasattr(entry, attr):
                return str(getattr(entry, attr))
        return str(entry)

    pflat, _ = tree_flatten_with_path(params)
    sflat = jax.tree_util.tree_leaves(
        param_specs, is_leaf=lambda s: isinstance(s, P))
    assert len(pflat) == len(sflat), "specs tree != params tree"
    pmap = {}
    for (path, leaf), spec in zip(pflat, sflat):
        pmap[tuple(keystr(e) for e in path)] = (spec, tuple(leaf.shape))

    oflat, treedef = tree_flatten_with_path(opt_state)
    out = []
    for path, leaf in oflat:
        keys = tuple(keystr(e) for e in path)
        spec = None
        for i in range(len(keys)):
            hit = pmap.get(keys[i:])
            if hit is not None and hit[1] == tuple(leaf.shape):
                spec = hit[0]
                break
        out.append(spec if spec is not None
                   else P(*([None] * getattr(leaf, "ndim", 0))))
    return tree_unflatten(treedef, out)


def shard_params(mesh: Mesh, params: Dict[str, Any],
                 specs: Dict[str, Any]) -> Dict[str, Any]:
    """device_put each leaf with its NamedSharding."""

    def place(path, leaf):
        sp = specs
        for k in path:
            sp = sp[k] if not isinstance(sp, (list, tuple)) else sp[int(k)]
        return jax.device_put(leaf, NamedSharding(mesh, sp))

    return _tree_map_with_path(place, params)


def replicate_params(mesh: Mesh, params):
    def place(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, P(*([None] * leaf.ndim))))

    return _tree_map_with_path(place, params)


def shard_pipeline_params(mesh: Mesh, t5_params, vae_params, dit_params):
    """Shard the three parameter trees for inference on ``mesh``.

    T5/DiT get within-layer splits over the sequence-parallel axes
    (``seq``, or ``ring``+``seq`` on a hybrid USP mesh); the VAE
    (96-dim convs, small) is replicated.
    """
    axis = ("ring", "seq") if "ring" in mesh.axis_names else "seq"
    t5_p = shard_params(mesh, t5_params, t5_param_specs(t5_params,
                                                        axis=axis))
    dit_p = shard_params(mesh, dit_params, dit_param_specs(dit_params,
                                                           axis=axis))
    vae_p = replicate_params(mesh, vae_params)
    return t5_p, vae_p, dit_p
