"""Ulysses sequence parallelism via ``shard_map`` collectives.

Parity target: the reference's two SP implementations — xfuser USP
monkey-patches for inference (``wan/distributed/xdit_context_parallel.py``)
and FastVideo ``all_to_all_4D`` for training
(``scripts/train/model/model_seq.py:231-256``). Both chunk the token
sequence across ranks for the whole block stack (context parallelism) and
re-shard tokens↔heads around attention (Ulysses).

Here that is ONE wrapper around the single model definition:

- activations enter ``shard_map`` sharded ``[B, L/sp, D]`` over the
  ``seq`` mesh axis (batch over ``data``);
- RoPE tables are sharded the same way, so each rank rotates its tokens
  with the correct global offsets (replaces the SP-aware ``rope_apply``
  forks, xdit_context_parallel.py:24-62 / model_seq.py:36-76);
- self-attention does ``all_to_all`` head-scatter/seq-gather, runs the
  Pallas flash kernel on the full sequence with ``N/sp`` local heads,
  and reverses the reshard (≡ ``all_to_all_4D(scatter 2, gather 1)``);
- cross-attention needs no communication: each rank queries its own
  tokens against the replicated 512-token text context (the reference's
  extra a2a + ``shrink_head`` for cross-attn, model_seq.py:286-294, is
  redundant work on TPU);
- the head/unpatchify run on the gathered output outside the shard_map
  (≡ ``all_gather(dim=1)`` before head, model_seq.py:780).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..configs import WanModelConfig
from ..models import wan_model
from ..ops.attention import attention
from ..ops.rope import RopeTables


def ulysses_self_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           k_lens: Optional[jnp.ndarray],
                           axis_name: str = "seq",
                           attn_backend: str = "auto",
                           compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """[B, L/sp, N, D] sharded → full-seq attention with N/sp local heads.

    Equivalent to FastVideo ``all_to_all_4D`` scatter_dim=2/gather_dim=1
    then the reverse (model_seq.py:231-256)."""
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            tiled=True)
    q = a2a(q, split_axis=2, concat_axis=1)
    k = a2a(k, split_axis=2, concat_axis=1)
    v = a2a(v, split_axis=2, concat_axis=1)
    out = attention(q, k, v, k_lens=k_lens, backend=attn_backend,
                    compute_dtype=compute_dtype)
    return a2a(out, split_axis=1, concat_axis=2)


def _padded_rope(rope: RopeTables, seq_len: int):
    """Pad tables to the padded sequence length with identity rotations
    so per-shard slices are uniform (padding tokens get cos=1/sin=0,
    matching the unrotated-passthrough semantics of rope_apply)."""
    cos = jnp.asarray(rope.cos)
    sin = jnp.asarray(rope.sin)
    l = cos.shape[0]
    if seq_len > l:
        cos = jnp.pad(cos, ((0, seq_len - l), (0, 0)), constant_values=1.0)
        sin = jnp.pad(sin, ((0, seq_len - l), (0, 0)), constant_values=0.0)
    return cos, sin


def sequence_parallel_forward(
        params, x: jnp.ndarray, t: jnp.ndarray, context: jnp.ndarray,
        cfg: WanModelConfig, rope: RopeTables, mesh: Mesh,
        seq_len: Optional[int] = None,
        compute_dtype=jnp.bfloat16, attn_backend: str = "auto",
        remat: bool = False,
        sp_mode: str = "ulysses",
        fsdp_params: bool = False,
        residual_dtype=jnp.float32,
        remat_group: int = 1,
        clip_fea: Optional[jnp.ndarray] = None,
        y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sequence-parallel WanModel forward over a (data, seq) mesh.

    Numerically equivalent to ``wan_model.forward`` (SP-invariance is a
    unit test); activations are context-parallel over ``seq`` through the
    whole block stack. ``sp_mode``:

    - 'ulysses': all_to_all head↔seq reshard, full-sequence attention
      with N/sp local heads (needs num_heads % sp == 0);
    - 'ring': KV shards rotate via ppermute, no chip ever holds the full
      sequence (the >per-chip-memory mode; ref --ring_size);
    - 'usp': hybrid Ulysses×Ring on a 3-axis (data, ring, seq) mesh — the
      reference's ``--ulysses_size U --ring_size R`` composition
      (xfuser ``initialize_model_parallel(ring_degree, ulysses_degree)``,
      generate.py:225-229). Tokens are sharded over ring×seq jointly;
      attention all_to_alls heads over the inner ``seq`` (Ulysses) axis,
      then rotates KV around the ``ring`` axis. Each chip holds L/R
      tokens × N/U heads at the attention peak.
    """
    seq_axes = ("ring", "seq") if "ring" in mesh.axis_names else ("seq",)
    sp = 1
    for a in seq_axes:
        sp *= mesh.shape[a]
    if sp_mode == "usp":
        assert "ring" in mesh.axis_names, (
            "sp_mode='usp' needs a (data, ring, seq) mesh")
        ulysses = mesh.shape["seq"]
        assert cfg.num_heads % ulysses == 0, (
            f"num_heads {cfg.num_heads} must divide by ulysses degree "
            f"{ulysses} (ref generate.py:238-239)")
    elif sp_mode == "ulysses":
        assert seq_axes == ("seq",), (
            "pure ulysses runs on a (data, seq) mesh")
        assert cfg.num_heads % sp == 0, (
            f"num_heads {cfg.num_heads} must divide by seq axis {sp} "
            "(ref generate.py:238-239)")
    elif sp_mode == "ring":
        assert seq_axes == ("seq",), (
            "pure ring runs on a (data, seq) mesh; use sp_mode='usp' on "
            "a (data, ring, seq) mesh")
    else:
        raise ValueError(f"unknown sp_mode: {sp_mode}")

    xt, e, e0, ctx, grid, k_lens = wan_model.embed_inputs(
        params, x, t, context, cfg, seq_len=seq_len,
        compute_dtype=compute_dtype, clip_fea=clip_fea, y=y)
    b, l = xt.shape[:2]
    assert l % sp == 0, (
        f"(padded) seq_len {l} must be a multiple of sp={sp} "
        "(ref text2video.py:164-166)")
    if k_lens is None:
        k_lens = jnp.full((b,), l, jnp.int32)
    cos, sin = _padded_rope(rope, l)

    if sp_mode == "ring":
        from .ring import ring_self_attention

        def self_attn_fn(q, k, v, kl):
            return ring_self_attention(
                q, k, v, kl, axis_name="seq", sp_size=sp,
                attn_backend=attn_backend, compute_dtype=compute_dtype)
    elif sp_mode == "usp":
        from .ring import ring_self_attention

        ring_n = mesh.shape["ring"]

        def self_attn_fn(q, k, v, kl):
            # Ulysses within the ring group: heads scatter over the inner
            # 'seq' axis, tokens gather to this rank's contiguous ring
            # block (ring-major shard order makes the gathered tokens
            # exactly block [r·L/R, (r+1)·L/R)).
            a2a = functools.partial(jax.lax.all_to_all, axis_name="seq",
                                    tiled=True)
            q2 = a2a(q, split_axis=2, concat_axis=1)
            k2 = a2a(k, split_axis=2, concat_axis=1)
            v2 = a2a(v, split_axis=2, concat_axis=1)
            out = ring_self_attention(
                q2, k2, v2, kl, axis_name="ring", sp_size=ring_n,
                attn_backend=attn_backend, compute_dtype=compute_dtype)
            return a2a(out, split_axis=1, concat_axis=2)
    else:
        def self_attn_fn(q, k, v, kl):
            return ulysses_self_attention(
                q, k, v, kl, axis_name="seq", attn_backend=attn_backend,
                compute_dtype=compute_dtype)

    shard_axis = seq_axes if len(seq_axes) > 1 else seq_axes[0]
    param_gather_fn = None
    if fsdp_params:
        # params enter shard_map sharded per dit_param_specs (FSDP at
        # rest); each layer's shards all-gather just-in-time inside the
        # scan body — grads reduce-scatter on the reverse pass.
        from .sharding import dit_param_specs

        pspecs = dit_param_specs(params, axis=shard_axis)
        block_specs = pspecs["blocks"]

        def gather_leaf(leaf, spec):
            # spec includes the leading layer dim the scan has sliced off
            for i, ax in enumerate(spec):
                if ax == shard_axis:
                    return jax.lax.all_gather(leaf, shard_axis, axis=i - 1,
                                              tiled=True)
            return leaf

        def param_gather_fn(bp):
            return jax.tree_util.tree_map(
                gather_leaf, bp, block_specs,
                is_leaf=lambda x: isinstance(x, P))
    else:
        pspecs = jax.tree_util.tree_map(lambda _: P(), params)

    def inner(p, xt_s, e0_s, ctx_s, cos_s, sin_s, klens_s):
        rope_s = RopeTables(cos=cos_s, sin=sin_s)
        return wan_model.run_blocks(
            p, xt_s, e0_s, ctx_s, cfg, rope_s, klens_s,
            compute_dtype=compute_dtype, attn_backend=attn_backend,
            remat=remat, self_attn_fn=self_attn_fn,
            param_gather_fn=param_gather_fn,
            residual_dtype=residual_dtype, remat_group=remat_group)

    xr = shard_map(
        inner, mesh=mesh,
        in_specs=(pspecs, P("data", shard_axis, None), P("data",),
                  P("data",), P(shard_axis, None), P(shard_axis, None),
                  P("data",)),
        out_specs=P("data", shard_axis, None),
        check_rep=False,
    )(params, xt, e0, ctx, cos, sin, k_lens)

    out = wan_model.head_output(params, xr, e, cfg)
    return wan_model.unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
