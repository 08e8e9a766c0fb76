"""Int8 weight-only quantization tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.models import wan_model
from moviigen_tpu.ops.quantization import (host_init_quantized_wan,
                                           quantize_linear,
                                           quantize_wan_params)
from moviigen_tpu.ops.rope import rope_3d_freqs

CFG = WAN_CONFIGS["t2v-tiny"].model


def test_quantize_linear_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
    q, s = quantize_linear(w)
    deq = q.astype(np.float32) * s[None, :]
    # per-channel absmax quantization: error ≤ scale/2 per element
    assert np.all(np.abs(deq - w) <= s[None, :] * 0.5 + 1e-8)


def test_quantized_forward_close_to_full():
    params = wan_model.init_params(jax.random.PRNGKey(0), CFG,
                                   dtype=jnp.float32)
    qparams = quantize_wan_params(
        jax.tree_util.tree_map(np.asarray, params))
    # block linears quantized; embeddings untouched
    assert "q8" in qparams["blocks"]["self_attn"]["q"]
    assert "kernel" in qparams["patch_embedding"]

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, 3, 8, 8)),
                    jnp.float32)
    ctx = jnp.asarray(
        rng.standard_normal((1, CFG.text_len, CFG.text_dim)), jnp.float32)
    rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
    full = wan_model.forward(params, x, jnp.asarray([500.0]), ctx, CFG,
                             rope, compute_dtype=jnp.float32,
                             attn_backend="xla")
    quant = wan_model.forward(qparams, x, jnp.asarray([500.0]), ctx, CFG,
                              rope, compute_dtype=jnp.float32,
                              attn_backend="xla")
    err = np.abs(np.asarray(full) - np.asarray(quant))
    rel = err.max() / max(np.abs(np.asarray(full)).max(), 1e-6)
    assert rel < 0.15, f"quantization error too large: {rel}"


def test_host_init_quantized_runs():
    qparams = host_init_quantized_wan(0, CFG)
    x = jnp.zeros((1, CFG.in_dim, 3, 8, 8))
    ctx = jnp.zeros((1, CFG.text_len, CFG.text_dim))
    rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
    dev = jax.tree_util.tree_map(jnp.asarray, qparams)
    out = wan_model.forward(dev, x, jnp.asarray([100.0]), ctx, CFG, rope,
                            attn_backend="xla")
    assert out.shape == (1, CFG.out_dim, 3, 8, 8)
    assert np.all(np.isfinite(np.asarray(out)))


class TestInt4:
    def test_pack_unpack_exact(self):
        """dequantize_leaf inverts the packer exactly (scale-multiplied)."""
        from moviigen_tpu.ops.quantization import (dequantize_leaf,
                                                   quantize_linear_int4)
        rng = np.random.default_rng(0)
        w = rng.standard_normal((2, 256, 48)).astype(np.float32) * 0.05
        q, s = quantize_linear_int4(w, group=128)
        assert q.shape == (2, 128, 48) and q.dtype == np.uint8
        assert s.shape == (2, 2, 48)
        k = np.asarray(dequantize_leaf(
            {"q4": jnp.asarray(q), "scale": jnp.asarray(s)}, jnp.float32))
        # reconstruct on host: codes → q → scale per group
        lo = (q & 0xF).astype(np.int8) - 8
        hi = (q >> 4).astype(np.int8) - 8
        full = np.empty((2, 256, 48), np.int8)
        full[:, 0::2], full[:, 1::2] = lo, hi
        ref = full.astype(np.float32) * np.repeat(s, 128, axis=1)
        np.testing.assert_array_equal(k, ref)
        # quantization error bounded by scale/2 per element
        assert np.all(np.abs(k - w) <= np.repeat(s, 128, axis=1) * 0.5 + 1e-8)

    def test_int4_forward_close_to_full(self):
        from moviigen_tpu.ops.quantization import quantize_wan_params
        params = wan_model.init_params(jax.random.PRNGKey(0), CFG,
                                       dtype=jnp.float32)
        qparams = quantize_wan_params(
            jax.tree_util.tree_map(np.asarray, params), bits=4)
        assert "q4" in qparams["blocks"]["self_attn"]["q"]
        assert "kernel" in qparams["patch_embedding"]

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, 3, 8, 8)),
                        jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((1, CFG.text_len, CFG.text_dim)),
            jnp.float32)
        rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
        full = wan_model.forward(params, x, jnp.asarray([500.0]), ctx, CFG,
                                 rope, compute_dtype=jnp.float32,
                                 attn_backend="xla")
        quant = wan_model.forward(qparams, x, jnp.asarray([500.0]), ctx,
                                  CFG, rope, compute_dtype=jnp.float32,
                                  attn_backend="xla")
        err = np.abs(np.asarray(full) - np.asarray(quant))
        rel = err.max() / max(np.abs(np.asarray(full)).max(), 1e-6)
        assert rel < 0.35, f"int4 quantization error too large: {rel}"

    def test_device_init_int4_runs(self):
        from moviigen_tpu.ops.quantization import device_init_quantized_wan
        qparams = device_init_quantized_wan(0, CFG, bits=4)
        # tiny cfg: dim=96 → q4 packed [L, 48, 96]
        assert qparams["blocks"]["self_attn"]["q"]["q4"].shape == (
            CFG.num_layers, CFG.dim // 2, CFG.dim)
        x = jnp.zeros((1, CFG.in_dim, 3, 8, 8))
        ctx = jnp.zeros((1, CFG.text_len, CFG.text_dim))
        rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
        out = wan_model.forward(qparams, x, jnp.asarray([100.0]), ctx, CFG,
                                rope, attn_backend="xla")
        assert out.shape == (1, CFG.out_dim, 3, 8, 8)
        assert np.all(np.isfinite(np.asarray(out)))


class TestT5Quant:
    @pytest.mark.parametrize("bits", [8, 4])
    def test_t5_quantized_encode_close(self, bits):
        """Quantized umT5 encoder (weight-only blocks + int8 per-row
        vocab table) stays close to the full-precision encode — the
        device-resident alternative to host offload on 16 GB chips."""
        import jax
        from moviigen_tpu.configs import WAN_CONFIGS
        from moviigen_tpu.models import t5 as t5m
        from moviigen_tpu.ops.quantization import quantize_t5_params

        cfg = WAN_CONFIGS["t2v-tiny"].t5
        params = t5m.init_params(jax.random.PRNGKey(0), cfg,
                                 dtype=jnp.float32)
        qparams = jax.tree_util.tree_map(
            jnp.asarray, quantize_t5_params(
                jax.tree_util.tree_map(np.asarray, params), bits=bits))
        tag = "q4" if bits == 4 else "q8"
        assert tag in qparams["blocks"]["attn"]["q"]
        assert "q8" in qparams["token_embedding"]

        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
        mask = jnp.asarray((np.arange(16)[None, :]
                            < np.array([[16], [9]])).astype(np.int32))
        full = t5m.encode(params, ids, mask, cfg)
        quant = t5m.encode(qparams, ids, mask, cfg)
        err = np.abs(np.asarray(full) - np.asarray(quant))
        rel = err.max() / max(np.abs(np.asarray(full)).max(), 1e-6)
        assert rel < (0.15 if bits == 8 else 0.5), rel
        # int8 embedding alone is ~0.4% error; check the scale survived
        assert np.all(np.isfinite(np.asarray(quant)))


class TestW8A8:
    def test_int8_matmul_exact(self):
        """int8×int8→int32 matches the integer reference exactly."""
        from moviigen_tpu.ops.quantization import int8_matmul

        rng = np.random.default_rng(0)
        a = rng.integers(-127, 128, (5, 64), dtype=np.int8)
        b = rng.integers(-127, 128, (64, 32), dtype=np.int8)
        out = np.asarray(int8_matmul(jnp.asarray(a), jnp.asarray(b)))
        ref = a.astype(np.int32) @ b.astype(np.int32)
        np.testing.assert_array_equal(out, ref)

    def test_w8a8_dense_matches_manual(self):
        """_dense W8A8 path == manual quantize-matmul-rescale."""
        from moviigen_tpu.ops.quantization import (quantize_activations,
                                                   quantize_linear)

        rng = np.random.default_rng(1)
        w = rng.standard_normal((64, 32)).astype(np.float32) * 0.05
        x = rng.standard_normal((2, 7, 64)).astype(np.float32)
        q, s = quantize_linear(w)
        bias = rng.standard_normal(32).astype(np.float32) * 0.01
        leaf = {"q8": jnp.asarray(q), "scale": jnp.asarray(s),
                "bias": jnp.asarray(bias),
                "a8": jnp.ones((), jnp.int8)}
        out = np.asarray(wan_model._dense(leaf, jnp.asarray(x),
                                          dtype=jnp.float32))
        xq, sx = quantize_activations(jnp.asarray(x))
        ref = (np.asarray(xq).astype(np.int32) @ q.astype(np.int32)
               ).astype(np.float32) * np.asarray(sx) * s + bias
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    def test_w8a8_forward_close_to_full(self):
        from moviigen_tpu.ops.quantization import quantize_wan_params

        params = wan_model.init_params(jax.random.PRNGKey(0), CFG,
                                       dtype=jnp.float32)
        qparams = quantize_wan_params(
            jax.tree_util.tree_map(np.asarray, params), bits=8,
            act8=True)
        assert "a8" in qparams["blocks"]["self_attn"]["q"]

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((1, CFG.in_dim, 3, 8, 8)),
                        jnp.float32)
        ctx = jnp.asarray(
            rng.standard_normal((1, CFG.text_len, CFG.text_dim)),
            jnp.float32)
        rope = rope_3d_freqs((3, 4, 4), CFG.head_dim)
        full = wan_model.forward(params, x, jnp.asarray([500.0]), ctx,
                                 CFG, rope, compute_dtype=jnp.float32,
                                 attn_backend="xla")
        quant = wan_model.forward(qparams, x, jnp.asarray([500.0]), ctx,
                                  CFG, rope, compute_dtype=jnp.float32,
                                  attn_backend="xla")
        err = np.abs(np.asarray(full) - np.asarray(quant))
        rel = err.max() / max(np.abs(np.asarray(full)).max(), 1e-6)
        assert rel < 0.25, f"W8A8 error too large: {rel}"

    def test_w8a8_pipeline_e2e(self):
        from moviigen_tpu.pipelines import WanT2V as _WanT2V

        qpipe = _WanT2V(config=WAN_CONFIGS["t2v-tiny"],
                        checkpoint_dir=None, quant="w8a8")
        video = qpipe.generate("hello", size=(64, 64), frame_num=5,
                               sampling_steps=2, seed=3)
        assert video.shape == (3, 5, 64, 64)
        assert np.all(np.isfinite(video))
