"""Text→video generation pipeline.

Parity target: ``wan/text2video.py`` (WanT2V.__init__/generate): the
CFG-guided flow-matching denoising loop around the DiT, umT5 encoder and
3D causal VAE, with UniPC (default) or DPM++ samplers.

TPU-native design differences:

- **Batched CFG**: the conditional and unconditional branches run as one
  ``B=2`` forward per step instead of two sequential forwards
  (ref text2video.py:240-243) — halves per-step launch count and doubles
  MXU batch efficiency.
- **One compiled step**: the denoise step (model forward + CFG combine) is
  jitted once per (resolution, frames) shape; scheduler updates are pure
  device linear combinations from precomputed host tables.
- **No CPU offload juggling** (ref text2video.py:175-259): params live on
  device (sharded across the mesh when one is provided).
- Seeding uses JAX PRNG; for seed-for-seed parity testing, ``generate``
  accepts an explicit ``noise`` array (SURVEY §7.3).
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..configs import PipelineConfig
from ..diffusion import (
    FlowDPMSolverMultistepScheduler,
    FlowUniPCMultistepScheduler,
    get_sampling_sigmas,
)
from ..models import t5 as t5m
from ..models import vae as vaem
from ..models import wan_model
from ..models.tokenizer import load_tokenizer
from ..ops.rope import rope_3d_freqs


def compute_target_shape_and_seq_len(config: PipelineConfig,
                                     size: Tuple[int, int],
                                     frame_num: int,
                                     sp_size: int = 1):
    """Latent target shape + token seq_len for a (W, H) size preset.

    The reference's latent-shape rule (text2video.py:160-162) and
    seq_len rounded to an sp multiple (text2video.py:164-166):
    480×832 @ 81f → 32,760 tokens; 1280×720 → 75,600; 1920×832 →
    131,040 (SURVEY §4 shape oracles; unit-tested)."""
    import math as _math

    vs = config.vae_stride
    ps = config.model.patch_size
    target_shape = (
        config.vae.z_dim,
        (frame_num - 1) // vs[0] + 1,
        size[1] // vs[1],
        size[0] // vs[2],
    )
    seq_len = int(_math.ceil(
        (target_shape[2] * target_shape[3]) / (ps[1] * ps[2])
        * target_shape[1] / sp_size)) * sp_size
    grid = (target_shape[1] // ps[0], target_shape[2] // ps[1],
            target_shape[3] // ps[2])
    return target_shape, seq_len, grid


# T5 trees above this size either host-offload (unquantized) or
# weight-only quantize to stay device-resident (quant modes); tests
# lower it to exercise both paths on the tiny config.
_T5_OFFLOAD_BYTES = 4 << 30

# Proven-path registry for the single-chip auto memory config
# (docs/performance.md "Single-chip 1080P-81f"): streamed head-group
# self-attention compiles and fits, but EXECUTING it deterministically
# faults the axon TPU worker. The r3-r5 bisect ladder is FINAL for this
# hardware/runtime revision (performance.md "Bisect rung verdicts"):
# every in-budget form — fori, unrolled static slices, token-chunked
# and whole-L DUS-free streamed-o (rung E14, r5) — crashes at execute
# while passing all CPU-backend oracles bit-exactly. Long sequences
# route to SP (--ulysses_size/--ring_size) or big-HBM chips instead;
# explicitly-set config fields and the MOVIIGEN_STREAMED_ATTN=1 env
# opt-in still reach the path for future hardware revisions.
STREAMED_ATTN_PROVEN = False

# Output-pixel volume (W*H*frame_num) past which generate() frees the
# DiT tree before the VAE decode on a single chip (720P-81f = 74.6M,
# 480x832-81f = 32.3M — the measured r4 boundary: 480p decodes with the
# 14B resident, 720P does not). Module-level so tests can lower it.
FREE_DIT_DECODE_PIXELS = 40_000_000


def _streamed_attn_allowed() -> bool:
    return STREAMED_ATTN_PROVEN or \
        os.environ.get("MOVIIGEN_STREAMED_ATTN", "") == "1"


def _auto_memory_config(cfg, seq_len: int, use_sp: bool, quant: bool):
    """Single-chip long-sequence memory auto-config (the serving-side
    answer to the reference's CPU-offload juggling, text2video.py:
    175-259). May choose, in order of escalation:

    1. ``ffn_chunk`` — token-streamed FFN (proven: the 720P headline
       runs it).
    2. ``attn_head_chunk`` (+ ``cross_attn_chunk``) — streamed
       attention, with the whole-L DUS-free streamed-o form
       (``attn_o_chunk=None``) by default and a token-chunked fallback
       past the certified transient envelope. The fori-loop form of
       these streams faults the axon-v5e worker at execute (r3 bisect):
       guarded by ``STREAMED_ATTN_PROVEN`` / ``MOVIIGEN_STREAMED_ATTN=1``
       — by default the pipeline raises an actionable error instead of
       wedging the worker for ~1 h.

    Explicitly-set config fields are never overridden. Under SP the
    per-chip sequence shard stays below every threshold and nothing is
    chunked. The choice set is pinned by tests/test_pipeline.py."""
    import dataclasses as _dc

    if use_sp:
        return cfg
    if cfg.ffn_chunk is None:
        # bound the [2B, L, ffn] bf16 transient to ~2 GB by streaming
        # tokens through the FFN (enables 131k-token 1080p on one
        # 16 GB chip). Quantized deployments keep T5 resident too, so
        # chunk from ~1 GB (measured: chunking costs <0.1% at the 14B
        # operating point — the GEMMs stay wide)
        limit = (1 << 30) if quant else (1 << 31)
        if 4 * seq_len * cfg.ffn_dim > limit:
            cfg = _dc.replace(cfg, ffn_chunk=8192 if quant else 16384)
    if cfg.attn_head_chunk is None:
        # bound the q/k/v/attn-out transients too: measured on a
        # 16 GB v5e the 14B runs 75.6k tokens unchunked but the
        # worker dies past ~75k (99.8k/131k) — q+k+v alone is
        # 3·2·L·dim bytes (3.1 GB at 99.8k). Chunk heads when that
        # sum exceeds ~2.4 GB, in groups of 8 (divisor-largest ≤8).
        if 6 * seq_len * cfg.dim > 2_400_000_000:
            if not _streamed_attn_allowed():
                # GUARD (VERDICT r3): fail fast with options instead
                # of routing users into the known worker fault.
                raise RuntimeError(
                    f"single-chip sequence of {seq_len} tokens needs "
                    "the streamed-attention memory config "
                    "(attn_head_chunk, whole-L streamed-o by default; "
                    "attn_o_chunk token-chunks it), whose fori form "
                    "is known to crash the TPU worker at execute on "
                    "this hardware (docs/performance.md 'Single-chip"
                    " 1080P-81f'). Options: (a) shard the sequence "
                    "across chips (--ulysses_size/--ring_size), "
                    "(b) reduce --size/--frame_num below ~78k "
                    "tokens, or (c) set MOVIIGEN_STREAMED_ATTN=1 to "
                    "try the experimental streamed path anyway.")
            hc = next((h for h in (8, 5, 4, 2)
                       if cfg.num_heads % h == 0
                       and h < cfg.num_heads), None)
            if hc:
                # unroll (python loops + static slices) avoids the
                # original fori suspects; note the r5 E14 verdict —
                # even this form faults the axon-v5e worker, which is
                # why this whole branch sits behind the guard above
                cfg = _dc.replace(cfg, attn_head_chunk=hc,
                                  stream_impl="unroll")
            if cfg.cross_attn_chunk is None:
                # stream cross-attn queries too (text kv is 512
                # tokens; no cross-query coupling — ~2.7 GB of
                # q/out transients at 131k)
                cfg = _dc.replace(cfg, cross_attn_chunk=16384)
            # Streamed-o form (r4 knob migration): attn_o_chunk=None is
            # the whole-L DUS-free default — each head group's
            # o-projection delta is one fp32 [B, L, D] plain add
            # (certified 15.56/15.75 GB at the 131k headline). Past the
            # certified envelope (~4 GB of per-group delta) fall back
            # to token-chunking the update so near-budget configs don't
            # OOM on the transient the migration introduced.
            if (cfg.attn_head_chunk is not None
                    and cfg.attn_o_chunk is None
                    and 4 * seq_len * cfg.dim > 4 << 30):
                cfg = _dc.replace(cfg, attn_o_chunk=16384)
    if cfg.attn_head_chunk is not None:
        o_form = (f"token-chunked({cfg.attn_o_chunk})"
                  if cfg.attn_o_chunk else "whole-L (DUS-free)")
        logging.info(
            "streamed-attention memory config: attn_head_chunk=%s "
            "cross_attn_chunk=%s ffn_chunk=%s stream_impl=%s "
            "streamed-o form=%s", cfg.attn_head_chunk,
            cfg.cross_attn_chunk, cfg.ffn_chunk, cfg.stream_impl,
            o_form if cfg.attn_o_stream else "accumulator (o-stream off)")
    return cfg


def _auto_residual_dtype(cfg, seq_len: int, use_sp: bool, rdt):
    """Escalate fp32 residuals to bfloat16 when the single-chip
    streamed-attention config is in play: fp32 residuals don't fit the
    131k-token 16 GB envelope (the bf16 residual stream is what closes
    the 1080P-81f budget — docs/performance.md "Single-chip 1080P-81f");
    <1% parity impact measured at 1.3B. An explicit bfloat16 choice and
    SP runs (per-chip shards are small) pass through unchanged."""
    if (not use_sp and cfg.attn_head_chunk is not None
            and 6 * seq_len * cfg.dim > 2_400_000_000
            and rdt == jnp.dtype(jnp.float32)):
        logging.info("auto residual_dtype=bfloat16 for the single-chip "
                     "%d-token streamed config", seq_len)
        return jnp.dtype(jnp.bfloat16)
    return rdt


def _drain(tree):
    """Force every enqueued op on the tree to finish via a scalar
    readback (the TPU stream is in-order; ``block_until_ready`` can
    return early through the remote relay — CLAUDE.md). Keeps init
    transients of one param tree from overlapping the next tree's
    allocations, which OOMs near the HBM limit."""
    leaf = jax.tree_util.tree_leaves(tree)[-1]
    float(jnp.sum(leaf.ravel()[:1]))


class WanT2V:
    """Owns DiT + T5 + VAE params and orchestrates generation."""

    def __init__(self, config: PipelineConfig,
                 checkpoint_dir: Optional[str] = None,
                 init_seed: int = 0,
                 attn_backend: str = "auto",
                 mesh=None,
                 sp_size: Optional[int] = None,
                 sp_mode: str = "ulysses",
                 offload_t5: str = "auto",
                 quant: Optional[str] = None,
                 prompt_cache: bool = True,
                 residual_dtype: str = "float32"):
        if quant not in (None, "int8", "int4", "w8a8"):
            raise ValueError(
                f"quant must be int8|int4|w8a8, got {quant!r}")
        if residual_dtype not in ("float32", "bfloat16"):
            raise ValueError("residual_dtype must be float32|bfloat16, "
                             f"got {residual_dtype!r}")
        # bfloat16 halves the residual-stream HBM footprint (measured
        # <1% output delta at 1.3B) — the knob that fits 131k-token
        # 1080P-81f on a single 16 GB chip. Applies to the single-chip
        # path only: under SP the tokens are sharded, so the fp32
        # residual stream (the reference's discipline, model.py:569-571)
        # stays affordable per chip.
        self._residual_dtype = jnp.dtype(residual_dtype)
        self.quant = quant
        self.config = config
        self.attn_backend = attn_backend
        self.mesh = mesh
        self.sp_mode = sp_mode
        self.num_train_timesteps = config.num_train_timesteps
        self.vae_stride = config.vae_stride
        self.patch_size = config.model.patch_size
        self.sample_neg_prompt = config.sample_neg_prompt
        self.sp_size = sp_size or 1
        dtype = config.jnp_param_dtype

        # T5 host offload (the reference's offload_model/t5_cpu juggling,
        # text2video.py:175-184): the umT5-XXL encoder (~11.6 GB bf16)
        # runs once per prompt — resident, it would crowd out the VAE
        # decode on small-HBM chips. Decide before creating params so the
        # offloaded tree is built host-side (no device round-trip).
        tc = config.t5
        t5_bytes = 2 * (tc.vocab_size * tc.dim + tc.num_layers * (
            3 * tc.dim * tc.dim_attn + tc.dim_attn * tc.dim
            + 3 * tc.dim * tc.dim_ffn))
        big_t5 = t5_bytes > _T5_OFFLOAD_BYTES
        self._quant_t5 = quant is not None and big_t5
        if offload_t5 == "auto":
            # big unquantized T5 on one small chip → host-kept,
            # upload-encode-free per prompt. Quantized mode shrinks the
            # encoder ~3.4x (int4: 11.6 GB → ~3.4 GB) but a 14B-int4
            # denoise step needs the freed HBM more than the encode
            # does, so the *quantized* tree is host-kept too (its upload
            # is 3.4x cheaper); under a mesh it stays device-resident
            # sharded. Pass offload_t5=False to force residency.
            offload_t5 = mesh is None and big_t5
        self._offload_t5 = bool(offload_t5)

        if checkpoint_dir is not None:
            from ..models.t5 import load_t5_checkpoint
            from ..models.vae_convert import load_vae_checkpoint
            from ..models.wan_convert import load_wan_checkpoint

            logging.info("loading checkpoints from %s", checkpoint_dir)
            if self._quant_t5:
                host_t5 = self._quantized_with_cache(
                    checkpoint_dir, f"t5_{quant}",
                    lambda: self._quantize_t5_tree(
                        checkpoint_dir, config, quant),
                    sources=[os.path.join(checkpoint_dir,
                                          config.t5_checkpoint)])
                if self._offload_t5:
                    self.t5_params = host_t5   # upload→encode→free
                else:
                    self.t5_params = jax.tree_util.tree_map(
                        jnp.asarray, host_t5)
                    _drain(self.t5_params)
            else:
                self.t5_params = load_t5_checkpoint(
                    os.path.join(checkpoint_dir, config.t5_checkpoint),
                    config.t5, dtype=jnp.dtype(config.t5_dtype),
                    as_numpy=self._offload_t5)
            self.vae_params = load_vae_checkpoint(
                os.path.join(checkpoint_dir, config.vae_checkpoint),
                config.vae, dtype=jnp.float32)
            if quant is not None and mesh is None:
                # host-keep until decode: every 100 MB of headroom
                # counts during the 14B-int4 denoise step
                self.vae_params = jax.tree_util.tree_map(
                    np.asarray, self.vae_params)
            if quant is not None:
                # stage the full-precision tree host-side (28 GB for the
                # 14B — never device-resident), quantize, then upload the
                # compact tree (int4: ~8 GB → the flagship fits one v5e).
                # The quantized tree is cached as safetensors next to the
                # checkpoint so later starts skip the staging entirely.
                def _quantize_dit():
                    from ..ops.quantization import quantize_wan_params

                    host_tree = load_wan_checkpoint(
                        checkpoint_dir, config.model, dtype=dtype,
                        as_numpy=True)
                    return quantize_wan_params(
                        host_tree, bits=4 if quant == "int4" else 8,
                        act8=quant == "w8a8")

                dit_shards = [
                    os.path.join(checkpoint_dir, f)
                    for f in os.listdir(checkpoint_dir)
                    if f.startswith("diffusion_pytorch_model")
                    and f.endswith(".safetensors")]

                def _build_dit():
                    # 2nd+ builds hit the quantized safetensors cache:
                    # no 28 GB staging, just the compact upload
                    tree = jax.tree_util.tree_map(
                        jnp.asarray, self._quantized_with_cache(
                            checkpoint_dir, f"dit_{quant}", _quantize_dit,
                            sources=dit_shards))
                    _drain(tree)
                    return tree
            else:
                def _build_dit():
                    return load_wan_checkpoint(
                        checkpoint_dir, config.model, dtype=dtype)
            self.dit_params = _build_dit()
            tok_path = os.path.join(checkpoint_dir, config.t5_tokenizer)
        else:
            logging.warning("no checkpoint_dir: random-init params "
                            "(smoke-test mode)")
            keys = jax.random.split(jax.random.PRNGKey(init_seed), 3)
            if self._quant_t5 and self._offload_t5:
                from ..ops.quantization import host_init_quantized_t5

                self.t5_params = host_init_quantized_t5(
                    init_seed, config.t5,
                    bits=4 if quant == "int4" else 8)
            elif self._quant_t5:
                from ..ops.quantization import device_init_quantized_t5

                self.t5_params = device_init_quantized_t5(
                    init_seed, config.t5,
                    bits=4 if quant == "int4" else 8)
                # retire init transients before the next tree's
                # allocation burst (async dispatch interleaves them;
                # near the HBM limit the overlap OOMs)
                _drain(self.t5_params)
            elif self._offload_t5:
                self.t5_params = t5m.host_init_params(
                    init_seed, config.t5, dtype=config.t5_dtype)
            else:
                self.t5_params = t5m.init_params(
                    keys[0], config.t5, dtype=jnp.dtype(config.t5_dtype))
            self.vae_params = vaem.init_params(keys[1], config.vae)
            if quant is not None:
                from ..ops.quantization import device_init_quantized_wan

                _drain(self.vae_params)
                if mesh is None:
                    self.vae_params = jax.tree_util.tree_map(
                        np.asarray, self.vae_params)

                def _build_dit():
                    tree = device_init_quantized_wan(
                        init_seed, config.model,
                        bits=4 if quant == "int4" else 8,
                        act8=quant == "w8a8")
                    _drain(tree)
                    return tree
            else:
                def _build_dit():
                    return wan_model.init_params(
                        keys[2], config.model, dtype=dtype)
            self.dit_params = _build_dit()
            tok_path = config.t5_tokenizer

        # Rebuild hook for the big-decode DiT offload (generate()): on a
        # single chip the ≥720P streaming VAE decode transients plus the
        # resident 14B tree exceed 16 GB (measured r4: 720P-81f denoise
        # completed, decode RESOURCE_EXHAUSTED), so generate() frees the
        # DiT before decoding and the next call rebuilds it — checkpoint
        # mode re-uploads from the quantized safetensors cache, smoke
        # mode re-inits deterministically from init_seed. The reference
        # juggles the same way with model.cpu() (text2video.py:257-259).
        self._dit_rebuild = _build_dit

        self.tokenizer = load_tokenizer(
            tok_path, seq_len=config.model.text_len, clean="whitespace",
            vocab_size=config.t5.vocab_size)

        # Prompt-embedding cache (preprocess-style; next to the
        # checkpoint): the umT5-XXL encode costs a ~3.4 GB (quantized) or
        # 11.6 GB transient upload per prompt through the relay in
        # offload mode — for repeated prompts (validation sets, serving
        # retries, CFG negative prompts, which rarely change) a cache hit
        # skips the upload AND the encode entirely.
        self._prompt_cache_dir = None
        if prompt_cache and checkpoint_dir is not None:
            self._prompt_cache_dir = os.path.join(
                checkpoint_dir, "moviigen_prompt_cache")
            t5_src = os.path.join(checkpoint_dir, config.t5_checkpoint)
            self._prompt_cache_tag = (
                f"{self._source_fingerprint([t5_src])};"
                f"quant={quant if self._quant_t5 else None};"
                f"len={config.model.text_len};"
                f"tok={type(self.tokenizer).__name__}")

        if mesh is not None:
            from ..parallel.sharding import shard_pipeline_params

            self.t5_params, self.vae_params, self.dit_params = \
                shard_pipeline_params(
                    mesh, self.t5_params, self.vae_params, self.dit_params)
            if sp_size is None:
                from ..parallel.mesh import mesh_axis_size

                self.sp_size = mesh_axis_size(mesh, "ring") \
                    * mesh_axis_size(mesh, "seq")

        self._t5_encode = jax.jit(
            lambda p, ids, mask: t5m.encode(p, ids, mask, config.t5))
        from ..models.vae_streaming import decode_streaming

        def _decode(p, z):
            # streaming decode bounds activation memory for real clip
            # sizes; the full-tensor path is faster for tiny shapes.
            # compute dtype per config (bf16 default: ~3.9x faster convs,
            # >50 dB vs fp32)
            z = z.astype(jnp.dtype(config.vae_decode_dtype))
            t, h, w = z.shape[2], z.shape[3] * 8, z.shape[4] * 8
            frames = 1 + (t - 1) * 4
            if frames * h * w > 2 ** 24:  # ~16M output pixels
                out = decode_streaming(p, z, config.vae)
            else:
                out = vaem.decode(p, z, config.vae)
            return out.astype(jnp.float32)

        self._vae_decode = jax.jit(_decode)
        self._denoise_step_cache = {}

    # ------------------------------------------------------------------

    @staticmethod
    def _source_fingerprint(sources) -> str:
        """Cheap identity of the full-precision source shards: name, byte
        size and mtime of every file. O(1) per file (no content hash —
        a 28 GB read per start would defeat the cache's purpose)."""
        parts = []
        for s in sorted(sources):
            try:
                st = os.stat(s)
                parts.append(
                    f"{os.path.basename(s)}:{st.st_size}:{st.st_mtime_ns}")
            except OSError:
                parts.append(f"{os.path.basename(s)}:missing")
        return ";".join(parts)

    @staticmethod
    def _quantized_with_cache(checkpoint_dir: str, tag: str, build,
                              sources=()):
        """Load a cached quantized tree (safetensors next to the
        checkpoint) or build + cache it. The cache header records a
        fingerprint of the source shards (size+mtime) and the quant tag;
        on mismatch — updated checkpoint in place, changed quant
        defaults — the stale cache is rebuilt instead of silently served.
        Cache write failures (read-only checkpoint dirs) degrade to
        quantize-per-start."""
        from ..ops.quantization import (load_quantized_checkpoint,
                                        read_quantized_metadata,
                                        save_quantized_checkpoint)

        cache = os.path.join(checkpoint_dir,
                             f"moviigen_quant_{tag}.safetensors")
        fp = WanT2V._source_fingerprint(sources)
        if os.path.exists(cache):
            try:
                meta = read_quantized_metadata(cache)
            except Exception:  # unreadable header → treat as stale
                meta = {}
            if meta.get("source_fingerprint", fp) == fp:
                logging.info("loading quantized cache %s", cache)
                return load_quantized_checkpoint(cache)
            logging.warning(
                "quantized cache %s is stale (source checkpoint changed);"
                " rebuilding", cache)
        tree = build()
        try:
            save_quantized_checkpoint(
                cache, tree,
                metadata={"source_fingerprint": fp, "tag": tag})
            logging.info("wrote quantized cache %s", cache)
        except Exception as e:  # noqa: BLE001 — cache is best-effort
            logging.warning("could not write quantized cache: %s", e)
        return tree

    def _quantize_t5_tree(self, checkpoint_dir, config, quant):
        from ..models.t5 import load_t5_checkpoint
        from ..ops.quantization import quantize_t5_params

        host = load_t5_checkpoint(
            os.path.join(checkpoint_dir, config.t5_checkpoint),
            config.t5, dtype=jnp.dtype(config.t5_dtype), as_numpy=True)
        return quantize_t5_params(host, bits=4 if quant == "int4" else 8)

    def _prompt_cache_path(self, text: str) -> Optional[str]:
        if self._prompt_cache_dir is None:
            return None
        import hashlib

        h = hashlib.sha256(
            f"{self._prompt_cache_tag}\x00{text}".encode()).hexdigest()
        return os.path.join(self._prompt_cache_dir, f"{h[:32]}.npz")

    def encode_text(self, texts) -> jnp.ndarray:
        """Prompt(s) → [B, text_len, t5_dim] with exact zeros beyond each
        true length (the reference trims to true length and re-pads with
        zeros before the DiT text MLP — t5.py:516-518 + model.py:549-554).

        Embeddings are cached per (prompt, T5-checkpoint fingerprint,
        quant mode) next to the checkpoint; a full-batch hit skips the
        T5 upload+encode entirely."""
        if isinstance(texts, str):
            texts = [texts]
        paths = [self._prompt_cache_path(t) for t in texts]
        if all(p is not None and os.path.exists(p) for p in paths):
            loaded = [np.load(p) for p in paths]
            logging.info("prompt-embedding cache hit (%d prompt(s))",
                         len(loaded))
            dt = jnp.dtype(str(loaded[0]["dtype"]))
            return jnp.asarray(
                np.stack([z["ctx"] for z in loaded])).astype(dt)
        ctx = self._encode_text_uncached(texts)
        if self._prompt_cache_dir is not None:
            try:
                os.makedirs(self._prompt_cache_dir, exist_ok=True)
                host = np.asarray(ctx, np.float32)  # bf16→fp32 exact
                for p, row in zip(paths, host):
                    np.savez(p, ctx=row, dtype=str(ctx.dtype))
            except OSError as e:  # read-only checkpoint dir — best-effort
                logging.warning("could not write prompt cache: %s", e)
        return ctx

    def _encode_text_uncached(self, texts) -> jnp.ndarray:
        ids, mask = self.tokenizer(texts, return_mask=True,
                                   add_special_tokens=True)
        ids = jnp.asarray(ids)
        mask = jnp.asarray(mask)
        if self._offload_t5:
            # upload → encode → free (device copies die with the locals)
            t5_dev = jax.tree_util.tree_map(jnp.asarray, self.t5_params)
            ctx = self._t5_encode(t5_dev, ids, mask)
            ctx = ctx * mask[..., None].astype(ctx.dtype)
            ctx.block_until_ready()
            del t5_dev
            return ctx
        ctx = self._t5_encode(self.t5_params, ids, mask)
        return ctx * mask[..., None].astype(ctx.dtype)

    def _forward_fn_raw(self, grid, seq_len: int):
        """(single DiT forward closure, cfg_batched flag)."""
        from ..parallel.mesh import mesh_axis_size

        cfg = self.config.model
        rope = rope_3d_freqs(grid, cfg.head_dim)
        backend = self.attn_backend
        mesh = self.mesh
        use_sp = mesh is not None and mesh_axis_size(mesh, "ring") \
            * mesh_axis_size(mesh, "seq") > 1
        cfg = _auto_memory_config(cfg, seq_len, use_sp, bool(self.quant))
        rdt = _auto_residual_dtype(cfg, seq_len, use_sp,
                                   self._residual_dtype)

        # CFG pairing: batched (one B=2 forward) is ~1.9x per step where
        # activations fit. At long sequence on a single chip the doubled
        # activation footprint is what OOMs — run cond/uncond
        # sequentially (B=1, the reference's own order,
        # text2video.py:240-243). Under SP the tokens are sharded, so
        # the per-chip footprint stays small and batching stays on.
        cfg_batched = use_sp or 2 * 2 * seq_len * (3 * cfg.dim) <= (1 << 30)

        def fwd(dit_params, x, t, ctx):
            if use_sp:
                from ..parallel.ulysses import sequence_parallel_forward

                return sequence_parallel_forward(
                    dit_params, x, t, ctx, cfg, rope, mesh,
                    seq_len=seq_len, attn_backend=backend,
                    sp_mode=self.sp_mode, fsdp_params=True)
            return wan_model.forward(
                dit_params, x, t, ctx, cfg, rope,
                seq_len=seq_len, attn_backend=backend,
                residual_dtype=rdt)

        return fwd, cfg_batched

    def _denoise_fn_raw(self, grid, seq_len: int, guide_scale: float):
        """Unjitted single-step denoise closure (for scan composition)."""
        fwd, cfg_batched = self._forward_fn_raw(grid, seq_len)

        def step(dit_params, latent, t, ctx_pair):
            if cfg_batched:
                x2 = jnp.concatenate([latent, latent], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                pred = fwd(dit_params, x2, t2, ctx_pair)
                cond, uncond = pred[:1], pred[1:]
            else:
                cond = fwd(dit_params, latent, t, ctx_pair[:1])
                uncond = fwd(dit_params, latent, t, ctx_pair[1:])
            return uncond + guide_scale * (cond - uncond)

        return step

    def _scan_denoise_fn(self, grid, seq_len, guide_scale, scheduler_key,
                         scheduler):
        """One compiled program for the WHOLE denoise loop (model forward
        + sampler update scanned over steps — zero per-step dispatch)."""
        key = ("scan", grid, seq_len, guide_scale, scheduler_key)
        if key not in self._denoise_step_cache:
            raw = self._denoise_fn_raw(grid, seq_len, guide_scale)

            def run(dit_params, latent, ctx_pair):
                return scheduler.scan_sample(
                    lambda lat, t: raw(dit_params, lat, t, ctx_pair),
                    latent)

            self._denoise_step_cache[key] = jax.jit(run)
        return self._denoise_step_cache[key]

    def _denoise_fn(self, grid, seq_len: int, guide_scale: float):
        """Per-step-dispatch CFG step. When the CFG pair runs
        sequentially (long sequence), the jitted unit is ONE forward and
        cond/uncond are two dispatches of the SAME compiled program —
        halving a compile that takes ~16 min at 14B/75k tokens through
        the remote compile helper (dispatch overhead is noise against a
        30+ s forward)."""
        key = (grid, seq_len, guide_scale)
        if key not in self._denoise_step_cache:
            fwd, cfg_batched = self._forward_fn_raw(grid, seq_len)
            if cfg_batched:
                self._denoise_step_cache[key] = jax.jit(
                    self._denoise_fn_raw(grid, seq_len, guide_scale))
            else:
                fwd_j = jax.jit(fwd)
                combine = jax.jit(
                    lambda c, u: u + guide_scale * (c - u))

                def step(dit_params, latent, t, ctx_pair):
                    cond = fwd_j(dit_params, latent, t, ctx_pair[:1])
                    uncond = fwd_j(dit_params, latent, t, ctx_pair[1:])
                    return combine(cond, uncond)

                self._denoise_step_cache[key] = step
        return self._denoise_step_cache[key]

    # ------------------------------------------------------------------

    def generate(self, input_prompt: str,
                 size: Tuple[int, int] = (1280, 720),
                 frame_num: int = 81,
                 shift: float = 5.0,
                 sample_solver: str = "unipc",
                 sampling_steps: int = 50,
                 guide_scale: float = 5.0,
                 n_prompt: str = "",
                 seed: int = -1,
                 noise: Optional[np.ndarray] = None,
                 return_latents: bool = False,
                 scan_loop: Optional[bool] = None):
        """Generate a video (ref WanT2V.generate, text2video.py:114-271).

        ``scan_loop=True`` runs the whole denoise loop as one compiled
        ``lax.scan`` program — zero per-step host dispatch. Default
        (None) auto-selects: scan for small/medium models where the
        ~40 ms/step dispatch overhead matters; per-step dispatch at
        flagship scale, where each step is tens of seconds (overhead is
        noise) and one giant 50-step program is slower to compile and
        harder on a fragile remote worker.

        Returns [C, F, H, W] numpy float32 in [-1, 1] (or the final latent
        when ``return_latents``).
        """
        if scan_loop is None:
            scan_loop = self.config.model.dim <= 2048
        if self.dit_params is None:
            logging.info("rebuilding DiT params (freed for a previous "
                         "large decode)")
            self.dit_params = self._dit_rebuild()
        target_shape, seq_len, grid = compute_target_shape_and_seq_len(
            self.config, size, frame_num, self.sp_size)

        if n_prompt == "":
            n_prompt = self.sample_neg_prompt
        if seed < 0:
            seed = int.from_bytes(os.urandom(4), "little")

        logging.info("encoding prompt (text_len=%d)",
                     self.config.model.text_len)
        ctx_pair = self.encode_text([input_prompt, n_prompt])

        if noise is None:
            key = jax.random.PRNGKey(seed)
            latent = jax.random.normal(
                key, (1, *target_shape), jnp.float32)
        else:
            latent = jnp.asarray(noise, jnp.float32).reshape(
                1, *target_shape)

        if sample_solver == "unipc":
            scheduler = FlowUniPCMultistepScheduler(
                num_train_timesteps=self.num_train_timesteps, shift=1.0)
            scheduler.set_timesteps(sampling_steps, shift=shift)
        elif sample_solver == "dpm++":
            scheduler = FlowDPMSolverMultistepScheduler(
                num_train_timesteps=self.num_train_timesteps, shift=1.0)
            scheduler.set_timesteps(
                sampling_steps,
                sigmas=get_sampling_sigmas(sampling_steps, shift))
        else:
            raise NotImplementedError(
                f"Unsupported solver: {sample_solver}")

        if scan_loop:
            logging.info(
                "denoising: %d %s steps at %d tokens (one compiled "
                "lax.scan program; first call compiles)",
                sampling_steps, sample_solver, seq_len)
            sched_key = (sample_solver, sampling_steps, float(shift))
            run = self._scan_denoise_fn(grid, seq_len, float(guide_scale),
                                        sched_key, scheduler)
            latent = run(self.dit_params, latent, ctx_pair)
            latent.block_until_ready()
        else:
            logging.info(
                "denoising: %d %s steps at %d tokens (per-step dispatch)",
                sampling_steps, sample_solver, seq_len)
            step_fn = self._denoise_fn(grid, seq_len, float(guide_scale))
            state = scheduler.init_state(latent)
            t_log = time.time()
            for i, t in enumerate(scheduler.timesteps):
                t_dev = jnp.asarray([float(t)], jnp.float32)
                noise_pred = step_fn(self.dit_params, latent, t_dev,
                                     ctx_pair)
                latent, state = scheduler.step(noise_pred, i, latent,
                                               state)
                if i % 10 == 0 or i == len(scheduler.timesteps) - 1:
                    jax.block_until_ready(latent)
                    logging.info("  step %d/%d (%.1f s elapsed)", i + 1,
                                 len(scheduler.timesteps),
                                 time.time() - t_log)

        if return_latents:
            return np.asarray(latent[0])

        # Free the DiT ahead of big single-chip decodes (≥~720P-81f
        # output volume): the decode transients need its HBM. The next
        # generate() rebuilds via self._dit_rebuild. Drain first — the
        # queued denoise ops hold references until they retire.
        if (self.mesh is None
                and size[0] * size[1] * frame_num
                > FREE_DIT_DECODE_PIXELS):
            _drain(latent)
            self.dit_params = None

        logging.info("VAE decode %s -> video", tuple(latent.shape))
        vae_p = self.vae_params
        host_kept = isinstance(
            jax.tree_util.tree_leaves(vae_p)[0], np.ndarray)
        if host_kept:
            vae_p = jax.tree_util.tree_map(jnp.asarray, vae_p)
        video = self._vae_decode(vae_p, latent)
        out = np.asarray(video[0], np.float32)
        if host_kept:
            del vae_p, video  # free the transient device copy
        return out
