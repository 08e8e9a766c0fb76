"""CLIP vision tower parity vs the reference (random weights, fp32)."""

import numpy as np
import pytest
import jax.numpy as jnp

import ref_loader
from moviigen_tpu.models.clip import (
    CLIPVisionConfig, convert_clip_vision_state_dict, vision_forward)

pytestmark = pytest.mark.skipif(
    not ref_loader.ref_available(), reason="reference tree not present")

CFG = CLIPVisionConfig(image_size=16, patch_size=4, dim=32, mlp_ratio=4,
                       out_dim=32, num_heads=4, num_layers=3,
                       activation="gelu")


@pytest.fixture(scope="module")
def ref_and_params():
    import torch

    torch.manual_seed(0)
    ref = ref_loader.load_ref_clip()
    model = ref.VisionTransformer(
        image_size=CFG.image_size, patch_size=CFG.patch_size, dim=CFG.dim,
        mlp_ratio=CFG.mlp_ratio, out_dim=CFG.out_dim,
        num_heads=CFG.num_heads, num_layers=CFG.num_layers,
        pool_type="token", pre_norm=True, post_norm=False,
        activation="gelu", attn_dropout=0.0, proj_dropout=0.0,
        embedding_dropout=0.0).eval().float()
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = convert_clip_vision_state_dict(sd, CFG, prefix="")
    return model, params


@pytest.mark.parametrize("use_31", [True, False])
def test_vision_parity(ref_and_params, use_31):
    import torch

    model, params = ref_and_params
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = model(torch.from_numpy(x), use_31_block=use_31).numpy()
    got = np.asarray(vision_forward(params, jnp.asarray(x), CFG,
                                    use_31_block=use_31))
    assert got.shape == want.shape  # [B, 1+patches, dim]
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_visual_features_shape():
    import jax

    from moviigen_tpu.models.clip import init_vision_params, visual_features

    cfg = CFG
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.zeros((1, 3, 24, 18))  # arbitrary input size → resized
    feats = visual_features(params, frames, cfg)
    assert feats.shape == (1, 1 + cfg.num_patches, cfg.dim)
