"""Streaming VAE must equal the full-tensor VAE (which is itself
parity-tested against the reference's streaming loop)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from moviigen_tpu.configs import VAEConfig
from moviigen_tpu.models import vae as jvae
from moviigen_tpu.models.vae_streaming import (decode_streaming,
                                               encode_streaming)

CFG = VAEConfig(dim=8, z_dim=4)


@pytest.fixture(scope="module")
def params():
    return jvae.init_params(jax.random.PRNGKey(0), CFG)


@pytest.mark.parametrize("frames", [1, 5, 13])
def test_encode_streaming_matches_full(params, frames):
    video = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3, frames, 16, 16)),
        jnp.float32)
    full = np.asarray(jvae.encode(params, video, CFG))
    stream = np.asarray(encode_streaming(params, video, CFG))
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("latent_frames", [1, 4])
def test_decode_streaming_matches_full(params, latent_frames):
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (1, CFG.z_dim, latent_frames, 4, 4)), jnp.float32)
    full = np.asarray(jvae.decode(params, z, CFG))
    stream = np.asarray(decode_streaming(params, z, CFG))
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-5, rtol=1e-4)


def test_streaming_jittable(params):
    f = jax.jit(lambda p, z: decode_streaming(p, z, CFG))
    z = jnp.zeros((1, CFG.z_dim, 3, 4, 4))
    out = f(params, z)
    assert out.shape == (1, 3, 9, 32, 32)


def test_decode_bf16_close_to_fp32():
    """The pipeline decodes in bf16 by default (config.vae_decode_dtype);
    it must stay visually lossless vs fp32 (PSNR above the ~48 dB 8-bit
    quantization floor on TPU; looser here to absorb CPU/TPU variance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import vae as vaem
    from moviigen_tpu.models.vae_streaming import decode_streaming

    cfg = WAN_CONFIGS["t2v-tiny"].vae
    params = vaem.init_params(jax.random.PRNGKey(0), cfg)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.z_dim, 3, 8, 8)), jnp.float32)
    o32 = np.asarray(decode_streaming(params, z, cfg), np.float32)
    o16 = np.asarray(decode_streaming(
        params, z.astype(jnp.bfloat16), cfg), np.float32)
    rng = float(o32.max() - o32.min())
    psnr = 10 * np.log10(rng ** 2 / float(np.mean((o32 - o16) ** 2)))
    assert psnr > 40.0, f"bf16 decode PSNR {psnr:.1f} dB too low"


@pytest.mark.parametrize("chunk_frames", [1, 2, 5])
def test_decode_chunk_frames_invariance(params, chunk_frames):
    """Multi-frame decode chunks (chunk latent frames per scan step —
    the big-HBM amortization knob, tools/bench_vae_chunks.py) are exact
    for any chunk size dividing T'-1: the cache math carries the same
    state regardless of step granularity."""
    z = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (1, CFG.z_dim, 11, 4, 4)), jnp.float32)
    full = np.asarray(jvae.decode(params, z, CFG))
    stream = np.asarray(decode_streaming(params, z, CFG,
                                         chunk_frames=chunk_frames))
    assert stream.shape == full.shape
    np.testing.assert_allclose(stream, full, atol=2e-5, rtol=1e-4)
