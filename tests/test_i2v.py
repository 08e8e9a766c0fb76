"""Image→video pipeline tests (tiny config, random weights)."""

import numpy as np
import pytest
import jax.numpy as jnp

from moviigen_tpu.configs import WAN_CONFIGS
from moviigen_tpu.pipelines.image2video import (WanI2V, build_i2v_mask,
                                                build_i2v_conditioning)


def test_i2v_mask_structure():
    msk = np.asarray(build_i2v_mask(9, 4, 6))
    assert msk.shape == (4, 3, 4, 6)  # 4 fold channels, (9-1)/4+1 frames
    # first latent frame covers input frames 0..3 = [1,1,1,1] (frame 0
    # repeated 4x); later latent frames all zero
    np.testing.assert_array_equal(msk[:, 0], np.ones((4, 4, 6)))
    np.testing.assert_array_equal(msk[:, 1:], np.zeros((4, 2, 4, 6)))


def test_i2v_generate(tmp_path):
    pipe = WanI2V(config=WAN_CONFIGS["i2v-tiny"], checkpoint_dir=None)
    image = np.random.default_rng(0).uniform(
        -1, 1, size=(3, 40, 56)).astype(np.float32)
    video = pipe.generate(
        "a figure starts to move", image, size=(64, 64), frame_num=5,
        sampling_steps=2, seed=3)
    assert video.shape == (3, 5, 64, 64)
    assert np.all(np.isfinite(video))


def test_i2v_conditioning_shapes():
    import jax

    from moviigen_tpu.models import clip as clipm
    from moviigen_tpu.models import vae as vaem

    cfg = WAN_CONFIGS["i2v-tiny"]
    vae_params = vaem.init_params(jax.random.PRNGKey(0), cfg.vae)
    ccfg = clipm.CLIPVisionConfig(image_size=16, patch_size=4, dim=32,
                                  num_heads=4, num_layers=2)
    clip_params = clipm.init_vision_params(jax.random.PRNGKey(1), ccfg)
    img = jnp.zeros((3, 32, 32))
    y, feats = build_i2v_conditioning(
        vae_params, clip_params, img, frames=5, size=(64, 48),
        vae_cfg=cfg.vae, clip_cfg=ccfg)
    assert y.shape == (4 + cfg.vae.z_dim, 2, 6, 8)
    assert feats.shape == (1, 1 + ccfg.num_patches, ccfg.dim)


def test_i2v_cli_end_to_end(tmp_path):
    """--task i2v-* routes through WanI2V with --image conditioning."""
    import numpy as np
    from PIL import Image

    from moviigen_tpu.cli.generate import main

    img = tmp_path / "cond.png"
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (64, 64, 3), dtype=np.uint8)).save(img)
    out = main(["--task", "i2v-tiny", "--size", "480*832",
                "--frame_num", "5", "--sample_steps", "2",
                "--base_seed", "9", "--image", str(img),
                "--save_file", str(tmp_path / "out.mp4")])
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_i2v_cli_requires_image():
    import pytest

    from moviigen_tpu.cli.generate import main

    with pytest.raises(AssertionError, match="--image"):
        main(["--task", "i2v-tiny", "--size", "480*832",
              "--frame_num", "5", "--base_seed", "1"])
