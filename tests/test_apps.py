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


def test_valid_training_watcher_lora_checkpoint(tmp_path):
    """Watcher on an ADAPTER-ONLY checkpoint (finetune --use_lora):
    rebuilds the A/B template from meta.json's rank/alpha/dtype,
    restores the adapters, attaches them to the base pipeline params,
    and renders — the continuous-validation workflow during (Q)LoRA
    training."""
    import jax

    from moviigen_tpu.cli.valid_training import main as watch_main
    from moviigen_tpu.configs import WAN_CONFIGS
    from moviigen_tpu.models import wan_model
    from moviigen_tpu.training.checkpoint import save_checkpoint
    from moviigen_tpu.training.lora import init_lora_params

    cfg = WAN_CONFIGS["t2v-tiny"].model
    params = wan_model.init_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=3,
                            dtype=jnp.bfloat16)
    out = tmp_path / "train_out_lora"
    save_checkpoint(str(out), 5, lora,
                    extra_meta={"lora": True, "lora_rank": 3,
                                "lora_alpha": 6, "lora_dtype": "bfloat16",
                                "quant": "none"})

    prompts = tmp_path / "prompts"
    prompts.mkdir()
    (prompts / "valid0.txt").write_text("a lora test prompt\n")

    watch_main([
        "--task", "t2v-tiny",
        "--output_dir", str(out),
        "--prompt_dir", str(prompts),
        "--size", "480*832",
        "--frame_num", "5",
        "--sample_steps", "1",
        "--once",
    ])
    vids = list((out / "checkpoint-step_5" / "validation_videos").iterdir())
    assert len(vids) == 1
    assert "valid0_step5" in vids[0].name


import jax.numpy as jnp  # noqa: E402


def test_validation_prompt_assets_exist():
    base = os.path.join(os.path.dirname(__file__), "..",
                        "assets", "valid_data_t2v")
    files = sorted(f for f in os.listdir(base) if f.endswith(".txt"))
    assert len(files) == 11
    for f in files:
        text = open(os.path.join(base, f)).read().strip()
        assert len(text) > 20


def test_prompt_expander_vl_dispatch():
    """Text-only expander ignores an image (ref prompt_extend.py:69-72);
    the builder sets is_vl from the task; VL default model differs."""
    from moviigen_tpu.utils.prompt_extend import (
        QwenPromptExpander, build_prompt_expander)

    text_exp = build_prompt_expander("local_qwen", task="t2v-14B")
    assert not text_exp.is_vl
    vl_exp = build_prompt_expander("local_qwen", task="i2v-14B")
    assert vl_exp.is_vl
    assert vl_exp.model_name == QwenPromptExpander.DEFAULT_VL_MODEL
    assert text_exp.model_name == QwenPromptExpander.DEFAULT_MODEL

    # image passed to a text-only expander must NOT route to
    # extend_with_img (no crash in a tokenizer without images kwargs);
    # with no local weights this degrades to status=False via extend()
    exp = QwenPromptExpander(model_name="/nonexistent")
    out = exp("a cat", image=object())
    assert not out.status and "rewriter" in out.message
