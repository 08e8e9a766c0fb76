"""End-to-end checkpoint-directory loading (reference file layout).

Builds a real checkpoint directory at the tiny config — DiT safetensors
(diffusers layout), T5 .pth, VAE .pth, all saved from the reference
PyTorch modules' state dicts — and drives `WanT2V(checkpoint_dir=...)`
through it, unquantized and quantized (incl. the quantized-tree
safetensors cache that later process starts load directly).
"""

import os

import numpy as np
import pytest

import ref_loader
from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.pipelines import WanT2V
from moviigen_tpu.pipelines import text2video as t2v_mod

CFGP = WAN_CONFIGS["t2v-tiny"]


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    import torch
    from safetensors.numpy import save_file

    torch.manual_seed(0)
    path = tmp_path_factory.mktemp("ckpt")

    # DiT — diffusers-layout safetensors shard
    m = CFGP.model
    ref = ref_loader.load_ref_model()
    dit = ref.WanModel(
        model_type=m.model_type, patch_size=list(m.patch_size),
        text_len=m.text_len, in_dim=m.in_dim, dim=m.dim,
        ffn_dim=m.ffn_dim, freq_dim=m.freq_dim, text_dim=m.text_dim,
        out_dim=m.out_dim, num_heads=m.num_heads,
        num_layers=m.num_layers, qk_norm=m.qk_norm,
        cross_attn_norm=m.cross_attn_norm, eps=m.eps).eval().float()
    save_file({k: v.detach().float().numpy()
               for k, v in dit.state_dict().items()},
              os.path.join(path, "diffusion_pytorch_model.safetensors"))

    # T5 encoder .pth
    t = CFGP.t5
    rt5 = ref_loader.load_ref_t5()
    enc = rt5.T5Encoder(
        vocab=t.vocab_size, dim=t.dim, dim_attn=t.dim_attn,
        dim_ffn=t.dim_ffn, num_heads=t.num_heads,
        num_layers=t.num_layers, num_buckets=t.num_buckets,
        shared_pos=t.shared_pos, dropout=0.0).eval().float()
    torch.save(enc.state_dict(), os.path.join(path, CFGP.t5_checkpoint))

    # VAE .pth
    v = CFGP.vae
    rvae = ref_loader.load_ref_vae()
    vae = rvae.WanVAE_(
        dim=v.dim, z_dim=v.z_dim, dim_mult=list(v.dim_mult),
        num_res_blocks=v.num_res_blocks, attn_scales=[],
        temperal_downsample=list(v.temporal_downsample)).eval()
    torch.save(vae.state_dict(), os.path.join(path, CFGP.vae_checkpoint))
    return str(path)


def test_checkpoint_dir_generate(ckpt_dir):
    pipe = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir)
    video = pipe.generate("a cat", size=(64, 64), frame_num=5,
                          sampling_steps=2, seed=42)
    assert video.shape == (3, 5, 64, 64)
    assert np.all(np.isfinite(video))


def test_checkpoint_dir_quantized_with_cache(ckpt_dir, monkeypatch):
    monkeypatch.setattr(t2v_mod, "_T5_OFFLOAD_BYTES", 0)

    pipe = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir, quant="int4")
    assert pipe._quant_t5
    assert "q4" in pipe.dit_params["blocks"]["self_attn"]["q"]
    assert "q8" in pipe.t5_params["token_embedding"]
    dit_cache = os.path.join(ckpt_dir, "moviigen_quant_dit_int4.safetensors")
    t5_cache = os.path.join(ckpt_dir, "moviigen_quant_t5_int4.safetensors")
    assert os.path.exists(dit_cache) and os.path.exists(t5_cache)
    a = pipe.generate("a cat", size=(64, 64), frame_num=5,
                      sampling_steps=2, seed=7, return_latents=True)

    # second start: loads the cached quantized trees → identical output
    pipe2 = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir, quant="int4")
    b = pipe2.generate("a cat", size=(64, 64), frame_num=5,
                       sampling_steps=2, seed=7, return_latents=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prompt_embedding_cache(ckpt_dir):
    """Second encode of the same prompts must hit the on-disk cache next
    to the checkpoint and return bit-identical embeddings (skipping the
    T5 upload+encode — the ~40 s/prompt cost in offload mode)."""
    pipe = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir)
    a = np.asarray(pipe.encode_text(["a cat", "a dog"]), np.float32)
    cache_dir = os.path.join(ckpt_dir, "moviigen_prompt_cache")
    assert os.path.isdir(cache_dir) and len(os.listdir(cache_dir)) >= 2

    # fresh pipeline, same checkpoint: full-batch hit, identical values
    pipe2 = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir)
    pipe2._encode_text_uncached = None  # a miss would crash
    b = np.asarray(pipe2.encode_text(["a cat", "a dog"]), np.float32)
    np.testing.assert_array_equal(a, b)

    # partial miss falls through to the encoder
    pipe3 = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir)
    c = np.asarray(pipe3.encode_text(["a cat", "a NEW prompt"]),
                   np.float32)
    np.testing.assert_array_equal(a[0], c[0])

    # disabled mode writes nothing
    n0 = len(os.listdir(cache_dir))
    pipe4 = WanT2V(config=CFGP, checkpoint_dir=ckpt_dir,
                   prompt_cache=False)
    pipe4.encode_text(["another uncached prompt"])
    assert len(os.listdir(cache_dir)) == n0


def test_quant_cache_stale_on_source_change(ckpt_dir):
    """An in-place update of the source checkpoint must invalidate the
    quantized cache (fingerprint mismatch → rebuild), not silently serve
    stale weights (ADVICE r1)."""
    from moviigen_tpu.ops.quantization import read_quantized_metadata

    dit_cache = os.path.join(ckpt_dir, "moviigen_quant_dit_int4.safetensors")
    shard = os.path.join(ckpt_dir, "diffusion_pytorch_model.safetensors")
    WanT2V(config=CFGP, checkpoint_dir=ckpt_dir, quant="int4")
    assert "source_fingerprint" in read_quantized_metadata(dit_cache)
    mtime0 = os.path.getmtime(dit_cache)

    # touch the source shard (simulates a re-published checkpoint)
    st = os.stat(shard)
    os.utime(shard, ns=(st.st_atime_ns, st.st_mtime_ns + 10 ** 9))
    WanT2V(config=CFGP, checkpoint_dir=ckpt_dir, quant="int4")
    assert os.path.getmtime(dit_cache) > mtime0, "stale cache not rebuilt"

    # unchanged sources → cache reused, not rebuilt
    mtime1 = os.path.getmtime(dit_cache)
    WanT2V(config=CFGP, checkpoint_dir=ckpt_dir, quant="int4")
    assert os.path.getmtime(dit_cache) == mtime1
