"""Continuous validation watcher.

Parity target: ``scripts/inference/valid_training.py`` — an infinite loop
that scans ``--output_dir`` for the newest ``checkpoint-step_N``, rebuilds
the pipeline on it, renders a fixed set of validation prompts and saves
the videos next to the checkpoint (the reference's eyeball regression
suite, SURVEY §4). The reference's drifted kwargs (weight_path /
STEP_DISTILL / seq_len, valid_training.py:333-345) are not replicated.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time

NEGATIVE_PROMPTS = {
    # ref valid_training.py:270-275 selectable CH/EN negative prompt
    "ch": None,  # falls back to the config default (Chinese)
    "en": (
        "Vibrant colors, overexposed, static, blurry details, subtitles, "
        "stylized, artwork, painting, still image, overall grayish, worst "
        "quality, low quality, JPEG compression artifacts, ugly, "
        "incomplete, extra fingers, poorly drawn hands, poorly drawn "
        "face, deformed, disfigured, deformed limbs, merged fingers, "
        "motionless frame, cluttered background, three legs, crowded "
        "background, walking backwards"
    ),
}


def _load_prompts(prompt_dir: str):
    files = sorted(glob.glob(os.path.join(prompt_dir, "*.txt")))
    prompts = []
    for f in files:
        with open(f) as fh:
            text = fh.read().strip()
        if text:
            prompts.append((os.path.splitext(os.path.basename(f))[0], text))
    return prompts


def _parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Watch a training dir and render validation prompts")
    p.add_argument("--task", type=str, default="t2v-14B")
    p.add_argument("--output_dir", type=str, required=True,
                   help="training output dir to watch for checkpoints")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="base checkpoint dir for T5/VAE/tokenizer")
    p.add_argument("--prompt_dir", type=str,
                   default="assets/valid_data_t2v")
    p.add_argument("--size", type=str, default="1280*720")
    p.add_argument("--frame_num", type=int, default=81)
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--sample_shift", type=float, default=5.0)
    p.add_argument("--sample_guide_scale", type=float, default=5.0)
    p.add_argument("--base_seed", type=int, default=42)
    p.add_argument("--neg_prompt_lang", type=str, default="ch",
                   choices=["ch", "en"])
    p.add_argument("--poll_interval", type=int, default=10)
    p.add_argument("--once", action="store_true",
                   help="run a single scan/render cycle (for testing)")
    return p.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s: %(message)s")

    from ..configs import SIZE_CONFIGS, WAN_CONFIGS
    from ..training.checkpoint import latest_checkpoint, restore_checkpoint
    from ..utils.io import cache_video

    cfg = WAN_CONFIGS[args.task]
    prompts = _load_prompts(args.prompt_dir)
    if not prompts:
        logging.warning("no validation prompts in %s", args.prompt_dir)
        return
    n_prompt = NEGATIVE_PROMPTS[args.neg_prompt_lang] or ""

    last_step = -1
    pipe = None
    while True:
        found = latest_checkpoint(args.output_dir)
        if found and found[1] > last_step:
            path, step = found
            logging.info("new checkpoint: %s (step %d)", path, step)
            from ..pipelines.text2video import WanT2V

            if pipe is None:
                pipe = WanT2V(config=cfg, checkpoint_dir=args.ckpt_dir)
                base_params = pipe.dit_params  # pristine base for LoRA
            meta = {}
            meta_path = os.path.join(path, "meta.json")
            if os.path.exists(meta_path):
                import json

                with open(meta_path) as f:
                    meta = json.load(f)
            if meta.get("lora"):
                # adapter-only checkpoint (finetune --use_lora): rebuild
                # the A/B template from the base, restore into it, and
                # attach as the rank-r side path — renders base+adapters
                # without materializing merged kernels (works for
                # quantized bases too)
                import jax

                from ..training.lora import attach_lora, init_lora_params

                import jax.numpy as jnp

                rank = int(meta.get("lora_rank", 64))
                alpha = float(meta.get("lora_alpha", 64))
                dt = jnp.dtype(meta.get("lora_dtype", "float32"))
                template = init_lora_params(jax.random.PRNGKey(0),
                                            base_params, rank=rank,
                                            dtype=dt)
                lora, _, _ = restore_checkpoint(path, template)
                pipe.dit_params = attach_lora(base_params, lora,
                                              alpha=alpha, rank=rank)
                logging.info("attached rank-%d adapters (alpha=%g)",
                             rank, alpha)
            else:
                # load the fine-tuned DiT params over the base pipeline
                pipe.dit_params, _, _ = restore_checkpoint(
                    path, pipe.dit_params)
            pipe._denoise_step_cache.clear()
            last_step = step

            save_dir = os.path.join(path, "validation_videos")
            os.makedirs(save_dir, exist_ok=True)
            for name, prompt in prompts:
                logging.info("rendering %s: %s", name, prompt[:60])
                video = pipe.generate(
                    prompt,
                    size=SIZE_CONFIGS[args.size],
                    frame_num=args.frame_num,
                    shift=args.sample_shift,
                    sampling_steps=args.sample_steps,
                    guide_scale=args.sample_guide_scale,
                    n_prompt=n_prompt,
                    seed=args.base_seed,
                )
                out = cache_video(
                    video, os.path.join(save_dir, f"{name}_step{step}.mp4"),
                    fps=cfg.sample_fps)
                logging.info("saved %s", out)
        if args.once:
            break
        time.sleep(args.poll_interval)


if __name__ == "__main__":
    main()
