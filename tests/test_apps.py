"""Validation watcher + app-level smoke tests (tiny config)."""

import json
import os

import numpy as np
import pytest


def test_valid_training_watcher_once(tmp_path):
    """Train 1 step → watcher picks up the checkpoint and renders the
    validation prompts (tiny model, 1 prompt, --once)."""
    import jax

    from moviigen_tpu.cli.valid_training import main as watch_main
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.training.checkpoint import save_checkpoint

    # fabricate a training checkpoint
    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg)
    out = tmp_path / "train_out"
    save_checkpoint(str(out), 7, params)

    prompts = tmp_path / "prompts"
    prompts.mkdir()
    (prompts / "valid0.txt").write_text("a test prompt\n")

    watch_main([
        "--task", "t2v-tiny",
        "--output_dir", str(out),
        "--prompt_dir", str(prompts),
        "--size", "480*832",
        "--frame_num", "5",
        "--sample_steps", "1",
        "--once",
    ])
    vids = list((out / "checkpoint-step_7" / "validation_videos").iterdir())
    assert len(vids) == 1
    assert "valid0_step7" in vids[0].name


import jax.numpy as jnp  # noqa: E402


def test_validation_prompt_assets_exist():
    base = os.path.join(os.path.dirname(__file__), "..",
                        "assets", "valid_data_t2v")
    files = sorted(f for f in os.listdir(base) if f.endswith(".txt"))
    assert len(files) == 11
    for f in files:
        text = open(os.path.join(base, f)).read().strip()
        assert len(text) > 20
