"""End-to-end pipeline tests on the tiny config (random weights)."""

import numpy as np
import pytest

from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.pipelines import WanT2V


@pytest.fixture(scope="module")
def pipe():
    return WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None)


def test_generate_video(pipe):
    video = pipe.generate(
        "a cat boxing on a stage", size=(64, 64), frame_num=5,
        sampling_steps=2, guide_scale=5.0, seed=42)
    assert video.shape == (3, 5, 64, 64)
    assert video.dtype == np.float32
    assert np.all(np.isfinite(video))
    assert video.min() >= -1.0 and video.max() <= 1.0


def test_generate_deterministic_by_seed(pipe):
    a = pipe.generate("hello", size=(64, 64), frame_num=5,
                      sampling_steps=2, seed=7, return_latents=True)
    b = pipe.generate("hello", size=(64, 64), frame_num=5,
                      sampling_steps=2, seed=7, return_latents=True)
    c = pipe.generate("hello", size=(64, 64), frame_num=5,
                      sampling_steps=2, seed=8, return_latents=True)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0


def test_free_dit_for_big_decode(monkeypatch):
    """Past FREE_DIT_DECODE_PIXELS the single-chip pipeline frees the
    DiT before the VAE decode (measured r4: 720P-81f denoise completed
    but decode RESOURCE_EXHAUSTED with the 14B tree resident) and the
    next generate() rebuilds it deterministically."""
    from moviigen_tpu.pipelines import text2video as t2v_mod

    monkeypatch.setattr(t2v_mod, "FREE_DIT_DECODE_PIXELS", 1)
    p = WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None)
    a = p.generate("x", size=(64, 64), frame_num=5, sampling_steps=1,
                   seed=3)
    assert p.dit_params is None  # freed for the decode
    # 2nd call rebuilds on demand (then frees again at its own decode)
    b = p.generate("x", size=(64, 64), frame_num=5, sampling_steps=1,
                   seed=3)
    np.testing.assert_array_equal(a, b)  # rebuild is deterministic


def test_generate_injected_noise_and_solvers(pipe):
    noise = np.random.default_rng(0).standard_normal(
        (4, 2, 8, 8)).astype(np.float32)
    lat_unipc = pipe.generate(
        "x", size=(64, 64), frame_num=5, sampling_steps=3,
        noise=noise, return_latents=True)
    lat_dpm = pipe.generate(
        "x", size=(64, 64), frame_num=5, sampling_steps=3,
        sample_solver="dpm++", noise=noise, return_latents=True)
    assert lat_unipc.shape == (4, 2, 8, 8)
    assert np.all(np.isfinite(lat_unipc))
    assert np.all(np.isfinite(lat_dpm))
    # different solvers at 3 steps must differ but stay in the same range
    assert np.abs(lat_unipc - lat_dpm).max() > 0


def test_latent_shape_rule(pipe):
    """target_shape (z, (F−1)/4+1, H/8, W/8) — ref text2video.py:160-162."""
    lat = pipe.generate("x", size=(96, 64), frame_num=9,
                        sampling_steps=1, return_latents=True)
    assert lat.shape == (4, 3, 8, 12)


def test_t2i_single_frame(pipe):
    """t2i path: frame_num=1 → single latent frame → one image frame."""
    img = pipe.generate("a painting", size=(64, 64), frame_num=1,
                        sampling_steps=2, seed=5)
    assert img.shape == (3, 1, 64, 64)
    assert np.all(np.isfinite(img))


def test_metrics_utils():
    from moviigen_tpu.utils.metrics import latent_parity_report, psnr, ssim

    a = np.random.default_rng(0).uniform(-1, 1, (2, 3, 32, 32))
    assert psnr(a, a) == float("inf")
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = a + 0.01
    assert 30 < psnr(a, b) < 60
    rep = latent_parity_report(a, b)
    assert abs(rep["max_abs_diff"] - 0.01) < 1e-9


def test_seq_len_shape_oracles():
    """SURVEY §4 shape oracles for the 14B config: token counts derived
    from the reference formulas (text2video.py:160-166; defaults
    finetune.py:708, valid_training.py:99)."""
    from moviigen_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
    from moviigen_tpu.pipelines.text2video import (
        compute_target_shape_and_seq_len)

    cfg = WAN_CONFIGS["t2v-14B"]
    for size_key, want_tokens, want_lat in [
        ("480*832", 32760, (16, 21, 104, 60)),
        ("1280*720", 75600, (16, 21, 90, 160)),
        ("1920*832", 131040, (16, 21, 104, 240)),
    ]:
        shape, seq_len, grid = compute_target_shape_and_seq_len(
            cfg, SIZE_CONFIGS[size_key], 81)
        assert seq_len == want_tokens, (size_key, seq_len)
        assert shape == want_lat, (size_key, shape)
        assert grid[0] * grid[1] * grid[2] == want_tokens
    # sp rounding: 75600 is not a multiple of 32 → rounds up
    _, seq_len, _ = compute_target_shape_and_seq_len(
        cfg, SIZE_CONFIGS["1280*720"], 81, sp_size=32)
    assert seq_len == 75616 and seq_len % 32 == 0


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_generate_quantized(quant):
    """Weight-only quantized DiT drives the full pipeline end-to-end
    (the int4 path is what fits the 14B flagship on one 16 GB chip)."""
    qpipe = WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None,
                   quant=quant)
    leaf = qpipe.dit_params["blocks"]["self_attn"]["q"]
    assert ("q4" if quant == "int4" else "q8") in leaf
    video = qpipe.generate(
        "a cat boxing on a stage", size=(64, 64), frame_num=5,
        sampling_steps=2, guide_scale=5.0, seed=42)
    assert video.shape == (3, 5, 64, 64)
    assert np.all(np.isfinite(video))


def test_generate_quantized_t5_resident(monkeypatch):
    """Under quant, a big T5 is weight-only quantized and device-resident
    (replacing host offload) — threshold lowered to hit the path on the
    tiny config."""
    from moviigen_tpu.pipelines import text2video as t2v_mod

    monkeypatch.setattr(t2v_mod, "_T5_OFFLOAD_BYTES", 0)
    qpipe = WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None,
                   quant="int4")
    # single-chip big-T5 policy: quantized tree host-kept, uploaded
    # transiently per encode (frees HBM for the denoise step)
    assert qpipe._quant_t5 and qpipe._offload_t5
    assert "q4" in qpipe.t5_params["blocks"]["attn"]["q"]
    assert "q8" in qpipe.t5_params["token_embedding"]
    import numpy as _np
    assert isinstance(
        qpipe.t5_params["token_embedding"]["q8"], _np.ndarray)
    video = qpipe.generate(
        "a cat boxing on a stage", size=(64, 64), frame_num=5,
        sampling_steps=2, guide_scale=5.0, seed=42)
    assert video.shape == (3, 5, 64, 64)
    assert np.all(np.isfinite(video))


def test_generate_quantized_t5_resident_sharded(monkeypatch):
    """Quantized T5 + DiT trees shard over a mesh (specs cover q4/q8
    leaf ranks) and the SP pipeline still generates."""
    import jax

    from moviigen_tpu.parallel.mesh import make_mesh
    from moviigen_tpu.pipelines import text2video as t2v_mod

    monkeypatch.setattr(t2v_mod, "_T5_OFFLOAD_BYTES", 0)
    mesh = make_mesh(data=2, seq=2)
    qpipe = WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None,
                   quant="int4", mesh=mesh)
    assert qpipe._quant_t5
    leaf = qpipe.t5_params["blocks"]["attn"]["q"]["q4"]
    assert "seq" in str(leaf.sharding.spec)
    video = qpipe.generate("a cat", size=(64, 64), frame_num=5,
                           sampling_steps=2, seed=11)
    assert video.shape == (3, 5, 64, 64)
    assert np.all(np.isfinite(video))


def test_generate_residual_bf16_close_to_fp32(pipe):
    """bfloat16 residual stream (the single-chip 131k-token HBM knob,
    --residual_dtype) produces latents close to the fp32-residual
    baseline — the dtype only touches the inter-block carry, not the
    fp32 islands (AdaLN/time-embed/norm/head)."""
    noise = np.random.default_rng(3).standard_normal(
        (4, 2, 8, 8)).astype(np.float32)
    ref = pipe.generate("a red fox", size=(64, 64), frame_num=5,
                        sampling_steps=2, noise=noise,
                        return_latents=True)
    bpipe = WanT2V(config=WAN_CONFIGS["t2v-tiny"], checkpoint_dir=None,
                   residual_dtype="bfloat16")
    got = bpipe.generate("a red fox", size=(64, 64), frame_num=5,
                         sampling_steps=2, noise=noise,
                         return_latents=True)
    assert np.all(np.isfinite(got))
    denom = max(1e-6, float(np.abs(ref).max()))
    assert np.abs(got - ref).max() / denom < 0.15

    with pytest.raises(ValueError):
        WanT2V(config=WAN_CONFIGS["t2v-tiny"], residual_dtype="fp8")


def test_auto_memory_config_choice_set(monkeypatch):
    """Pin exactly which knobs single-chip auto-config may choose
    (VERDICT r3): ffn_chunk is the only stream it enables on its own;
    the known-faulting attn_head_chunk+cross_attn_chunk combo must
    raise an actionable error unless MOVIIGEN_STREAMED_ATTN=1 (or the
    path is marked proven)."""
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.pipelines.text2video import _auto_memory_config

    monkeypatch.delenv("MOVIIGEN_STREAMED_ATTN", raising=False)
    cfg = WAN_CONFIGS["t2v-14B"].model
    assert cfg.ffn_chunk is None and cfg.attn_head_chunk is None

    # 720P (75,600 tokens): FFN stream only — the proven headline path
    out = _auto_memory_config(cfg, 75600, use_sp=False, quant=True)
    assert out.ffn_chunk == 8192
    assert out.attn_head_chunk is None
    assert out.cross_attn_chunk is None

    # 1080P-81f (131,040 tokens): must raise, not wedge the worker
    with pytest.raises(RuntimeError, match="MOVIIGEN_STREAMED_ATTN"):
        _auto_memory_config(cfg, 131040, use_sp=False, quant=True)

    # explicit env opt-in reaches the streamed combo (bisect work),
    # and auto-config selects the execute-proven unroll impl for it
    monkeypatch.setenv("MOVIIGEN_STREAMED_ATTN", "1")
    out = _auto_memory_config(cfg, 131040, use_sp=False, quant=True)
    assert out.attn_head_chunk == 8
    assert out.cross_attn_chunk == 16384
    assert out.stream_impl == "unroll"

    # under SP nothing is chunked (per-chip shards are small)
    monkeypatch.delenv("MOVIIGEN_STREAMED_ATTN", raising=False)
    out = _auto_memory_config(cfg, 131040, use_sp=True, quant=True)
    assert out == cfg

    # explicitly-set fields are never overridden and bypass the guard
    import dataclasses

    cfg_exp = dataclasses.replace(cfg, attn_head_chunk=4,
                                  cross_attn_chunk=4096, ffn_chunk=4096)
    out = _auto_memory_config(cfg_exp, 131040, use_sp=False, quant=True)
    assert out == cfg_exp


def test_auto_residual_dtype_escalation(monkeypatch):
    """The single-chip streamed-attention config auto-escalates fp32
    residuals to bfloat16 (fp32 residuals don't fit the 131k-token
    16 GB envelope); explicit bf16, SP runs, and sub-threshold
    sequences pass through unchanged."""
    import jax.numpy as jnp

    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.pipelines.text2video import (
        _auto_memory_config, _auto_residual_dtype)

    monkeypatch.setenv("MOVIIGEN_STREAMED_ATTN", "1")
    cfg14 = WAN_CONFIGS["t2v-14B"].model
    f32, bf16 = jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16)

    # 131k single-chip streamed config → escalate
    out = _auto_memory_config(cfg14, 131040, use_sp=False, quant=True)
    assert _auto_residual_dtype(out, 131040, False, f32) == bf16
    # explicit bf16 stays bf16 (no-op)
    assert _auto_residual_dtype(out, 131040, False, bf16) == bf16
    # under SP nothing is chunked and fp32 stays
    sp_cfg = _auto_memory_config(cfg14, 131040, use_sp=True, quant=True)
    assert _auto_residual_dtype(sp_cfg, 131040, True, f32) == f32
    # 720P (75,600 tokens, no head chunk) keeps fp32 residuals — the
    # measured headline path is unchanged
    out720 = _auto_memory_config(cfg14, 75600, use_sp=False, quant=True)
    assert _auto_residual_dtype(out720, 75600, False, f32) == f32
