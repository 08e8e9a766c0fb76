"""Checkpoint key-census tests (SURVEY §7.3: converters "with exhaustive
key-coverage asserts").

Two layers of proof, chained:
1. Full scale — the ``expected_*_keys(cfg)`` manifests equal the key
   census of the reference torch modules instantiated at PRODUCTION size
   (14B DiT per wan/modules/model.py:361-484, umT5-XXL per t5.py:456-469,
   the production VAE per vae.py:592-616) on the meta device (shape-only,
   no weight materialization).
2. Tiny scale — the converters, run on real reference state dicts,
   consume exactly the manifest key set, error on any unconsumed/extra
   key, and error with context on any missing key.
Together: the converters consume every key a real checkpoint contains.
"""

import numpy as np
import pytest
import torch

import ref_loader
from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.models.t5 import (convert_t5_state_dict,
                                    expected_t5_decoder_keys,
                                    expected_t5_encoder_keys)
from moviigen_tpu.models.vae_convert import (convert_vae_state_dict,
                                             expected_vae_keys)
from moviigen_tpu.models.wan_convert import (convert_wan_state_dict,
                                             expected_wan_keys)

pytestmark = pytest.mark.skipif(not ref_loader.ref_available(),
                                reason="reference tree not present")


# ---------------------------------------------------------------- full scale

def _meta_wan_keys(cfg):
    ref = ref_loader.load_ref_model()
    with torch.device("meta"):
        m = ref.WanModel(
            model_type=cfg.model_type, patch_size=list(cfg.patch_size),
            text_len=cfg.text_len, in_dim=cfg.in_dim, dim=cfg.dim,
            ffn_dim=cfg.ffn_dim, freq_dim=cfg.freq_dim,
            text_dim=cfg.text_dim, out_dim=cfg.out_dim,
            num_heads=cfg.num_heads, num_layers=cfg.num_layers,
            qk_norm=cfg.qk_norm, cross_attn_norm=cfg.cross_attn_norm,
            eps=cfg.eps)
    return set(m.state_dict().keys())


@pytest.mark.parametrize("name", ["t2v-14B", "i2v-14B", "t2v-1.3B",
                                  "t2v-tiny", "i2v-tiny"])
def test_wan_manifest_matches_reference_census(name):
    cfg = WAN_CONFIGS[name].model
    assert expected_wan_keys(cfg) == _meta_wan_keys(cfg)


def test_t5_manifest_matches_umt5_xxl_census():
    """Full umT5-XXL encoder (24L, d4096, ffn 10240, vocab 256384,
    shared_pos=False — ref t5.py:456-469)."""
    cfg = WAN_CONFIGS["t2v-14B"].t5
    rt5 = ref_loader.load_ref_t5()
    with torch.device("meta"):
        enc = rt5.T5Encoder(
            vocab=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
            dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
            num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
            shared_pos=cfg.shared_pos, dropout=0.0)
    assert expected_t5_encoder_keys(cfg) == set(enc.state_dict().keys())


def test_t5_decoder_manifest_matches_reference_census():
    cfg = WAN_CONFIGS["t2v-14B"].t5
    rt5 = ref_loader.load_ref_t5()
    with torch.device("meta"):
        dec = rt5.T5Decoder(
            vocab=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
            dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
            num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
            shared_pos=cfg.shared_pos, dropout=0.0)
    assert expected_t5_decoder_keys(cfg) == set(dec.state_dict().keys())


def test_vae_manifest_matches_production_census():
    """Production VAE: dim 96, z 16, dim_mult [1,2,4,4],
    temperal_downsample [False,True,True] (ref vae.py:592-616)."""
    cfg = WAN_CONFIGS["t2v-14B"].vae
    rvae = ref_loader.load_ref_vae()
    with torch.device("meta"):
        vae = rvae.WanVAE_(
            dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
            num_res_blocks=cfg.num_res_blocks, attn_scales=[],
            temperal_downsample=list(cfg.temporal_downsample))
    assert expected_vae_keys(cfg) == set(vae.state_dict().keys())


# ---------------------------------------------------------------- tiny scale

@pytest.fixture(scope="module")
def tiny_dit_sd():
    cfg = WAN_CONFIGS["t2v-tiny"].model
    ref = ref_loader.load_ref_model()
    torch.manual_seed(0)
    m = ref.WanModel(
        model_type=cfg.model_type, patch_size=list(cfg.patch_size),
        text_len=cfg.text_len, in_dim=cfg.in_dim, dim=cfg.dim,
        ffn_dim=cfg.ffn_dim, freq_dim=cfg.freq_dim, text_dim=cfg.text_dim,
        out_dim=cfg.out_dim, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, qk_norm=cfg.qk_norm,
        cross_attn_norm=cfg.cross_attn_norm, eps=cfg.eps).eval().float()
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_wan_converter_consumes_exact_census(tiny_dit_sd):
    cfg = WAN_CONFIGS["t2v-tiny"].model
    assert set(tiny_dit_sd.keys()) == expected_wan_keys(cfg)
    convert_wan_state_dict(tiny_dit_sd, cfg, strict=True)  # must not raise


def test_wan_converter_rejects_extra_key(tiny_dit_sd):
    cfg = WAN_CONFIGS["t2v-tiny"].model
    sd = dict(tiny_dit_sd)
    sd["blocks.0.self_attn.q.weight_scale"] = np.ones((1,), np.float32)
    with pytest.raises(ValueError, match="not consumed"):
        convert_wan_state_dict(sd, cfg, strict=True)
    # non-strict tolerates (e.g. forward-compat with annotated ckpts)
    convert_wan_state_dict(sd, cfg, strict=False)


def test_wan_converter_reports_missing_key(tiny_dit_sd):
    cfg = WAN_CONFIGS["t2v-tiny"].model
    sd = dict(tiny_dit_sd)
    del sd["blocks.1.ffn.0.weight"]
    with pytest.raises(KeyError, match="blocks.1.ffn.0.weight"):
        convert_wan_state_dict(sd, cfg, strict=True)


def test_wan_converter_rejects_wrong_variant(tiny_dit_sd):
    """A t2v checkpoint loaded as i2v must fail loudly (missing k_img),
    and an i2v checkpoint loaded as t2v must fail on unconsumed keys."""
    i2v_cfg = WAN_CONFIGS["i2v-tiny"].model
    with pytest.raises(KeyError, match="k_img"):
        convert_wan_state_dict(tiny_dit_sd, i2v_cfg, strict=True)


def test_t5_converter_census_and_strictness():
    cfg = WAN_CONFIGS["t2v-tiny"].t5
    rt5 = ref_loader.load_ref_t5()
    torch.manual_seed(0)
    enc = rt5.T5Encoder(
        vocab=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
        shared_pos=cfg.shared_pos, dropout=0.0).eval().float()
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    assert set(sd.keys()) == expected_t5_encoder_keys(cfg)
    convert_t5_state_dict(sd, cfg, strict=True)

    sd_extra = dict(sd, **{"lm_head.weight": np.ones((2, 2), np.float32)})
    with pytest.raises(ValueError, match="not consumed"):
        convert_t5_state_dict(sd_extra, cfg, strict=True)
    sd_missing = dict(sd)
    del sd_missing["blocks.0.attn.q.weight"]
    with pytest.raises(KeyError, match="blocks.0.attn.q.weight"):
        convert_t5_state_dict(sd_missing, cfg, strict=True)


def test_vae_converter_census_and_strictness():
    cfg = WAN_CONFIGS["t2v-tiny"].vae
    rvae = ref_loader.load_ref_vae()
    torch.manual_seed(0)
    vae = rvae.WanVAE_(
        dim=cfg.dim, z_dim=cfg.z_dim, dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks, attn_scales=[],
        temperal_downsample=list(cfg.temporal_downsample)).eval()
    sd = {k: v.detach().numpy() for k, v in vae.state_dict().items()}
    assert set(sd.keys()) == expected_vae_keys(cfg)
    convert_vae_state_dict(sd, cfg, strict=True)

    sd_extra = dict(sd, **{"encoder.extra.gamma": np.ones(1, np.float32)})
    with pytest.raises(ValueError, match="not consumed"):
        convert_vae_state_dict(sd_extra, cfg, strict=True)
    sd_missing = dict(sd)
    del sd_missing["decoder.head.2.weight"]
    with pytest.raises(KeyError, match="decoder.head.2.weight"):
        convert_vae_state_dict(sd_missing, cfg, strict=True)
