"""Numerical parity of the JAX VAE against the reference PyTorch VAE
(loaded standalone from /root/reference) on random weights.

This specifically validates that our full-tensor temporal ops equal the
reference's chunked streaming-cache execution (the only path the reference
actually runs — SURVEY.md §7.3 'VAE causal cache as scan state')."""

import numpy as np
import pytest
import jax.numpy as jnp

import ref_loader
from moviigen_tpu.configs import VAEConfig
from moviigen_tpu.models import vae as jvae
from moviigen_tpu.models.vae_convert import convert_vae_state_dict

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree not present")

CFG = VAEConfig(dim=8, z_dim=4)


@pytest.fixture(scope="module")
def ref_and_params():
    import torch

    torch.manual_seed(0)
    ref = ref_loader.load_ref_vae()
    model = ref.WanVAE_(
        dim=CFG.dim, z_dim=CFG.z_dim, dim_mult=list(CFG.dim_mult),
        num_res_blocks=CFG.num_res_blocks, attn_scales=[],
        temperal_downsample=list(CFG.temporal_downsample)).eval()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = convert_vae_state_dict(sd, CFG, dtype=jnp.float32)
    return model, params


def _scale():
    import torch

    mean = torch.tensor(jvae.LATENT_MEAN[:CFG.z_dim])
    std = torch.tensor(jvae.LATENT_STD[:CFG.z_dim])
    return [mean, 1.0 / std]


@pytest.mark.parametrize("frames", [1, 5, 9])
def test_encode_parity(ref_and_params, frames):
    import torch

    model, params = ref_and_params
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 3, frames, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = model.encode(torch.from_numpy(video), _scale()).numpy()
    got = np.asarray(jvae.encode(params, jnp.asarray(video), CFG))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("latent_frames", [1, 3])
def test_decode_parity(ref_and_params, latent_frames):
    import torch

    model, params = ref_and_params
    rng = np.random.default_rng(2)
    z = rng.standard_normal(
        (1, CFG.z_dim, latent_frames, 4, 4)).astype(np.float32)

    with torch.no_grad():
        want = model.decode(torch.from_numpy(z), _scale()).clamp_(-1, 1).numpy()
    got = np.asarray(jvae.decode(params, jnp.asarray(z), CFG))

    assert got.shape == want.shape
    # frame count rule: T = 1 + 4·(T'−1)
    assert got.shape[2] == 1 + 4 * (latent_frames - 1)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_encode_shape_rule(ref_and_params):
    """Latent shape (z, (F−1)/4+1, H/8, W/8) — ref text2video.py:160-162."""
    _, params = ref_and_params
    video = jnp.zeros((1, 3, 13, 32, 24))
    z = jvae.encode(params, video, CFG)
    assert z.shape == (1, CFG.z_dim, 4, 4, 3)


def test_roundtrip_init_params_runs():
    """Random-init params (no reference) encode/decode shapes line up."""
    import jax

    params = jvae.init_params(jax.random.PRNGKey(0), CFG)
    video = jnp.zeros((1, 3, 5, 16, 16))
    z = jvae.encode(params, video, CFG)
    out = jvae.decode(params, z, CFG)
    assert out.shape == (1, 3, 5, 16, 16)
