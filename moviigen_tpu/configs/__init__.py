"""Model / pipeline configuration registry.

Parity: mirrors the reference's EasyDict config system
(``wan/configs/shared_config.py:6-19``, ``wan/configs/wan_t2v_14B.py:8-29``,
``wan/configs/__init__.py:13-43``) as frozen dataclasses so configs are
hashable and usable as jit static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanModelConfig:
    """DiT backbone hyperparameters (ref: wan/modules/model.py:372-442)."""

    model_type: str = "t2v"  # 't2v' | 'i2v'
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 16
    dim: int = 2048
    ffn_dim: int = 8192
    freq_dim: int = 256
    text_dim: int = 4096
    out_dim: int = 16
    num_heads: int = 16
    num_layers: int = 32
    window_size: Tuple[int, int] = (-1, -1)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    # token-chunk size for the FFN (None = whole sequence at once).
    # Bounds the [B, L, ffn_dim] transient — at 131k tokens (1080p) that
    # buffer alone is ~4.7 GB in bf16, which is why the reference needs
    # multi-GPU SP there; chunking lets long sequences run single-chip.
    ffn_chunk: Optional[int] = None
    # heads per self-attention group (None = all heads at once).
    # Bounds the q/k/v/attn-out transients: at 131k tokens each is
    # ~1.34 GB in bf16 with 40 heads — chunking 8 heads at a time cuts
    # the attention working set ~5x, the knob (with ffn_chunk and
    # bfloat16 residuals) that fits 14B 1080P-81f on one 16 GB chip.
    # Full-dim qk RMS-norm stats are computed in an extra q/k projection
    # pass (~4% step FLOPs at 131k where attention dominates).
    attn_head_chunk: Optional[int] = None
    # query-token chunk for cross-attention (None = whole sequence).
    # The text context is only 512 tokens, so cross-attention has no
    # cross-query coupling worth batching: streaming q bounds the
    # [B, L, dim] q and [B, L, N, D] out transients (~2.7 GB at 131k),
    # numerics identical.
    cross_attn_chunk: Optional[int] = None
    # with attn_head_chunk set, stream each head group's o-projection
    # straight into the residual (the deepest memory collapse — see
    # wan_model._self_attention_streamed). False keeps the head-chunked
    # accumulator + whole o-projection instead: ~2.7 GB more transient
    # at 131k tokens but one fewer in-loop construct (bisect knob for
    # hardware-revision kernel faults in the streamed paths).
    attn_o_stream: bool = True
    # token-chunk for the streamed o-projection's residual update
    # (attn_o_stream). None = whole-L per head group: each group's
    # partial o-projection is added to the residual as ONE plain
    # elementwise add — no dynamic_update_slice anywhere in the
    # self-attention path. A chunk bounds the per-group [B, L, dim]
    # o-projection transient in exchange for that in-place stream
    # construct. NOTE: on the axon-v5e worker EVERY streamed
    # self-attention form — including this whole-L DUS-free one (bisect
    # rung E14, r5) — faults at execute at 14B dims; see
    # docs/performance.md "Bisect rung verdicts" (final).
    attn_o_chunk: Optional[int] = None
    # training-side token chunk for the FFN stage (ignored when
    # ffn_chunk is set): chunks are scanned with a per-chunk
    # jax.checkpoint so the FFN intermediate never materializes at
    # [L, ffn_dim] in the BACKWARD pass either (the serving streams
    # above grow training memory — their loop carries get saved by
    # autodiff). The enabler for 75,600-token (720p) training steps
    # on a 16 GB chip.
    ffn_bwd_chunk: Optional[int] = None
    # training-side q-token chunk for SELF-ATTENTION (ignored when the
    # serving streams are on): full k/v are computed once, q-chunks are
    # scanned with a per-chunk jax.checkpoint, so one chunk's
    # q/rope/attn-out/o-proj transients (not the full-L set) are live
    # during its backward. The r3 finding was that the 75,600-token
    # training bound is precisely this per-layer attention-backward
    # working set (docs/performance.md). Deliberately self-only: the
    # same chunking applied to the cross attention AOT-measured 5-6 GB
    # WORSE (see the note in wan_model.attention_block).
    attn_bwd_chunk: Optional[int] = None
    # Streamed-path loop implementation: "fori" (lax.fori_loop +
    # dynamic slices — minimal HLO, compiles once per body) or
    # "unroll" (python loops + static slices — larger HLO, identical
    # math). The unrolled form exists because the fori form's execute
    # deterministically faults the axon-v5e TPU worker (r3 bisect,
    # docs/performance.md "Single-chip 1080P-81f"); it avoids both
    # suspect constructs: Pallas kernels inside dynamic loops and
    # dynamic-sliced int4-packed weights.
    stream_impl: str = "fori"
    # Backend override for CROSS-attention only (None = follow the call
    # site's attn_backend). Rationale: the 'chunked' backend materializes
    # [N, Lq, Lk] score/probability buffers in HBM — fine for the
    # q-chunked self-attention backward (attn_bwd_chunk bounds Lq), but
    # the text cross-attention runs whole-L (Lk = text_len 512), where
    # those buffers are f32 [40, L, 512] = 2.5 GB at 32,760 tokens. The
    # Pallas kernel keeps them in VMEM tiles; 'pallas' here recovers
    # that while the self-attention path keeps its memory-bounded
    # chunked backward (the single-chip 14B QLoRA recipe).
    cross_attn_backend: Optional[str] = None

    def __post_init__(self):
        """Single validation point for the memory knobs (VERDICT r4
        item 9): contradictory combinations are REJECTED here instead of
        one knob silently winning inside ``wan_model.attention_block``.

        Precedence that the model implements (and this enforces):
        - serving streams (``attn_head_chunk``/``attn_o_stream``) own the
          self-attention path; ``attn_bwd_chunk`` is a training-side knob
          for the UNSTREAMED path, so combining them is an error;
        - ``attn_o_chunk`` refines the streamed o-projection and needs
          ``attn_head_chunk`` + ``attn_o_stream=True`` to be reachable;
        - ``ffn_chunk`` (forward-only in-place stream) and
          ``ffn_bwd_chunk`` (AD-friendly scanned chunks) are mutually
          exclusive implementations of the same stage.
        """
        if self.model_type not in ("t2v", "i2v"):
            raise ValueError(f"model_type {self.model_type!r} not in "
                             "('t2v', 'i2v')")
        if self.stream_impl not in ("fori", "unroll"):
            raise ValueError(f"stream_impl {self.stream_impl!r} not in "
                             "('fori', 'unroll')")
        if self.cross_attn_backend not in (None, "auto", "pallas",
                                           "chunked", "xla"):
            raise ValueError(
                f"cross_attn_backend {self.cross_attn_backend!r} not in "
                "(None, 'auto', 'pallas', 'chunked', 'xla')")
        for knob in ("ffn_chunk", "attn_head_chunk", "cross_attn_chunk",
                     "attn_o_chunk", "ffn_bwd_chunk", "attn_bwd_chunk"):
            val = getattr(self, knob)
            if val is not None and val <= 0:
                raise ValueError(f"{knob} must be positive, got {val}")
        if self.attn_head_chunk is not None \
                and self.num_heads % self.attn_head_chunk != 0:
            raise ValueError(
                f"attn_head_chunk {self.attn_head_chunk} must divide "
                f"num_heads {self.num_heads}")
        if self.attn_o_chunk is not None and (
                self.attn_head_chunk is None or not self.attn_o_stream):
            raise ValueError(
                "attn_o_chunk token-chunks the STREAMED o-projection: it "
                "requires attn_head_chunk set and attn_o_stream=True "
                "(default None = whole-L plain adds, the DUS-free form)")
        if self.attn_bwd_chunk is not None \
                and self.attn_head_chunk is not None:
            raise ValueError(
                "attn_bwd_chunk (training-side q-chunked self-attention) "
                "and attn_head_chunk (serving-side streamed attention) "
                "are mutually exclusive — the serving stream would take "
                "precedence and silently ignore attn_bwd_chunk")
        if self.ffn_bwd_chunk is not None and self.ffn_chunk is not None:
            raise ValueError(
                "ffn_chunk (forward-only in-place FFN stream) and "
                "ffn_bwd_chunk (AD-friendly scanned FFN chunks) are "
                "mutually exclusive — pick the serving knob for "
                "inference, the bwd knob for training")

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    def replace(self, **kw) -> "WanModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """3D causal VAE hyperparameters (ref: wan/modules/vae.py:592-616)."""

    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temporal_downsample: Tuple[bool, ...] = (False, True, True)

    def replace(self, **kw) -> "VAEConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class T5Config:
    """umT5-XXL encoder hyperparameters (ref: wan/modules/t5.py:456-469)."""

    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False

    @property
    def head_dim(self) -> int:
        return self.dim_attn // self.num_heads

    def replace(self, **kw) -> "T5Config":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level task config (ref: wan/configs/shared_config.py +
    wan_t2v_14B.py)."""

    name: str = "t2v-14B"
    model: WanModelConfig = dataclasses.field(default_factory=WanModelConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    t5: T5Config = dataclasses.field(default_factory=T5Config)
    vae_stride: Tuple[int, int, int] = (4, 8, 8)
    num_train_timesteps: int = 1000
    sample_fps: int = 16
    param_dtype: str = "bfloat16"
    t5_dtype: str = "bfloat16"
    # VAE decode compute dtype: bf16 runs the decoder convs ~3.9x faster
    # on TPU at >50 dB PSNR vs fp32 (above 8-bit quantization noise; the
    # reference itself caches bf16 latents, preprocess.sh). Set
    # "float32" for bit-parity work.
    vae_decode_dtype: str = "bfloat16"
    # checkpoint file conventions within --ckpt_dir (parity with reference)
    t5_checkpoint: str = "models_t5_umt5-xxl-enc-bf16.pth"
    t5_tokenizer: str = "google/umt5-xxl"
    vae_checkpoint: str = "Wan2.1_VAE.pth"
    # default negative prompt (ref: wan/configs/shared_config.py:19)
    sample_neg_prompt: str = (
        "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，"
        "整体发灰，最差质量，低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，"
        "画得不好的手部，画得不好的脸部，畸形的，毁容的，形态畸形的肢体，手指融合，"
        "静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
    )

    @property
    def jnp_param_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


def _t2v_14b() -> PipelineConfig:
    # ref: wan/configs/wan_t2v_14B.py:19-29
    return PipelineConfig(
        name="t2v-14B",
        model=WanModelConfig(
            model_type="t2v",
            patch_size=(1, 2, 2),
            dim=5120,
            ffn_dim=13824,
            freq_dim=256,
            num_heads=40,
            num_layers=40,
            qk_norm=True,
            cross_attn_norm=True,
            eps=1e-6,
        ),
    )


def _t2v_1_3b() -> PipelineConfig:
    # Wan2.1 1.3B shape (public Wan2.1 family config); used as the
    # CPU-runnable small operating point (BASELINE.json config #1).
    return PipelineConfig(
        name="t2v-1.3B",
        model=WanModelConfig(
            model_type="t2v",
            patch_size=(1, 2, 2),
            dim=1536,
            ffn_dim=8960,
            freq_dim=256,
            num_heads=12,
            num_layers=30,
            qk_norm=True,
            cross_attn_norm=True,
            eps=1e-6,
        ),
    )


def _tiny_test() -> PipelineConfig:
    """Miniature config for unit tests — same structure, trivial sizes."""
    return PipelineConfig(
        name="t2v-tiny",
        model=WanModelConfig(
            model_type="t2v",
            patch_size=(1, 2, 2),
            text_len=16,
            in_dim=4,
            dim=96,
            ffn_dim=192,
            freq_dim=32,
            text_dim=32,
            out_dim=4,
            num_heads=4,
            num_layers=2,
        ),
        vae=VAEConfig(dim=8, z_dim=4),
        t5=T5Config(
            vocab_size=128, dim=32, dim_attn=32, dim_ffn=64,
            num_heads=4, num_layers=2,
        ),
    )


def _i2v_14b() -> PipelineConfig:
    """i2v model variant (Wan2.1 family): in_dim = z + mask(4) + z = 36.

    The reference ships the i2v code paths but no i2v weights
    (SURVEY §7.2 item 11); config provided for the full capability
    surface."""
    base = _t2v_14b()
    return base.replace(
        name="i2v-14B",
        model=base.model.replace(model_type="i2v", in_dim=36))


def _i2v_tiny() -> PipelineConfig:
    base = _tiny_test()
    return base.replace(
        name="i2v-tiny",
        model=base.model.replace(model_type="i2v", in_dim=12))


WAN_CONFIGS = {
    "t2v-14B": _t2v_14b(),
    "t2i-14B": dataclasses.replace(_t2v_14b(), name="t2i-14B"),
    "i2v-14B": _i2v_14b(),
    "t2v-1.3B": _t2v_1_3b(),
    "t2v-tiny": _tiny_test(),
    "i2v-tiny": _i2v_tiny(),
}

# ref: wan/configs/__init__.py:18-31
SIZE_CONFIGS = {
    "1920*1056": (1920, 1056),
    "1920*1072": (1920, 1072),
    "1920*832": (1920, 832),
    "1280*560": (1280, 560),
    "560*1280": (560, 1280),
    "1056*1920": (1056, 1920),
    "832*1920": (832, 1920),
    "720*1280": (720, 1280),
    "1280*720": (1280, 720),
    "480*832": (480, 832),
    "832*480": (832, 480),
    "1024*1024": (1024, 1024),
}

# ref: wan/configs/__init__.py:33-38
MAX_AREA_CONFIGS = {
    "720*1280": 720 * 1280,
    "1280*720": 1280 * 720,
    "480*832": 480 * 832,
    "832*480": 832 * 480,
}

# ref: wan/configs/__init__.py:40-43
SUPPORTED_SIZES = {
    "t2v-14B": (
        "720*1280", "1280*720", "480*832", "832*480", "1920*1056",
        "1056*1920", "1920*832", "832*1920", "1920*1072", "1072*1920",
        "1280*560", "560*1280",
    ),
    "t2v-1.3B": ("480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-tiny": tuple(SIZE_CONFIGS.keys()),
    "i2v-tiny": tuple(SIZE_CONFIGS.keys()),
    "t2i-14B": tuple(SIZE_CONFIGS.keys()),
}
