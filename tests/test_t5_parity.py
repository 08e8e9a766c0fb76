"""Numerical parity of the JAX umT5 encoder against the reference PyTorch
T5Encoder (loaded standalone on CPU) on random weights, fp32."""

import numpy as np
import pytest
import jax.numpy as jnp

import ref_loader
from moviigen_tpu.configs import T5Config
from moviigen_tpu.models import t5 as jt5

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree not present")

CFG = T5Config(vocab_size=96, dim=32, dim_attn=32, dim_ffn=64,
               num_heads=4, num_layers=3, num_buckets=32, shared_pos=False)


@pytest.fixture(scope="module")
def ref_and_params():
    import torch

    torch.manual_seed(0)
    ref = ref_loader.load_ref_t5()
    model = ref.T5Encoder(
        vocab=CFG.vocab_size, dim=CFG.dim, dim_attn=CFG.dim_attn,
        dim_ffn=CFG.dim_ffn, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, num_buckets=CFG.num_buckets,
        shared_pos=CFG.shared_pos, dropout=0.0).eval().float()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = jt5.convert_t5_state_dict(sd, CFG, dtype=jnp.float32)
    return model, params


def test_encoder_parity(ref_and_params):
    import torch

    model, params = ref_and_params
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 20))
    mask = np.ones((2, 20), np.int64)
    mask[0, 13:] = 0  # padded sample
    mask[1, 7:] = 0

    with torch.no_grad():
        want = model(torch.from_numpy(ids),
                     torch.from_numpy(mask)).numpy()
    got = np.asarray(jt5.encode(
        params, jnp.asarray(ids), jnp.asarray(mask), CFG))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_encoder_no_mask(ref_and_params):
    import torch

    model, params = ref_and_params
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size, size=(1, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids), None).numpy()
    got = np.asarray(jt5.encode(params, jnp.asarray(ids), None, CFG))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_rel_pos_buckets_match_reference():
    import torch

    ref = ref_loader.load_ref_t5()
    emb = ref.T5RelativeEmbedding(32, 4, bidirectional=True)
    lq = lk = 24
    rel_pos = torch.arange(lk).unsqueeze(0) - torch.arange(lq).unsqueeze(1)
    want = emb._relative_position_bucket(rel_pos).numpy()
    got = jt5.relative_position_buckets(lq, lk, 32)
    np.testing.assert_array_equal(got, want)


def test_decoder_parity():
    import torch

    import jax.numpy as jnp
    from moviigen_tpu.models.t5 import convert_t5_decoder_state_dict, decode

    torch.manual_seed(3)
    ref = ref_loader.load_ref_t5()
    model = ref.T5Decoder(
        vocab=CFG.vocab_size, dim=CFG.dim, dim_attn=CFG.dim_attn,
        dim_ffn=CFG.dim_ffn, num_heads=CFG.num_heads,
        num_layers=CFG.num_layers, num_buckets=CFG.num_buckets,
        shared_pos=False, dropout=0.0).eval().float()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = convert_t5_decoder_state_dict(sd, CFG)

    rng = np.random.default_rng(4)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 7))
    enc = rng.standard_normal((2, 9, CFG.dim)).astype(np.float32)
    enc_mask = np.ones((2, 9), np.int64)
    enc_mask[1, 5:] = 0

    with torch.no_grad():
        want = model(torch.from_numpy(ids), None,
                     torch.from_numpy(enc),
                     torch.from_numpy(enc_mask)).numpy()
    got = np.asarray(decode(params, jnp.asarray(ids), jnp.asarray(enc),
                            jnp.asarray(enc_mask), CFG))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
