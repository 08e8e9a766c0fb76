"""Dataset preprocessing CLI: raw videos → VAE latents + T5 embeddings.

Parity target: ``scripts/data_preprocess/preprocess_wan_dataset.py`` —
per-video VAE encode and T5 caption encode cached to disk, per-item
metadata, a resumable processed-items checkpoint with periodic autosave
and signal handlers, per-error-type budgets, and a final merged
``videos2caption_<run>.json`` + ``videos2caption_latest.json`` symlink.

TPU-native: encoding is jitted per video shape (shape-bucketed by the
cinematic crop sizes, so at most a few compilations); multi-host sharding
is ``--shard_idx/--num_shards`` (modulo split) instead of torchrun ranks.
Caches are ``.npy`` (readable by ``training.data.load_tensor`` alongside
the reference's ``.pt``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import sys
import time
from collections import defaultdict
from datetime import datetime


def _parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Preprocess videos into latent/embedding caches")
    p.add_argument("--data_merge_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--task", type=str, default="t2v-14B")
    p.add_argument("--dataset", type=str, default="t2v",
                   choices=["t2v", "i2v"],
                   help="i2v additionally caches first-frame mask+latent "
                        "conditioning (y) and CLIP features "
                        "(ref preprocess_wan_dataset.py:489-536)")
    p.add_argument("--model_path", type=str, default=None,
                   help="checkpoint dir for VAE/T5 (random if unset)")
    p.add_argument("--num_frames", type=int, default=81)
    p.add_argument("--train_fps", type=int, default=16)
    p.add_argument("--max_height", type=int, default=1080)
    p.add_argument("--max_width", type=int, default=1920)
    p.add_argument("--crop_height", type=int, default=None,
                   help="override: single crop size for all aspect bins")
    p.add_argument("--crop_width", type=int, default=None)
    p.add_argument("--drop_short_ratio", type=float, default=1.0)
    p.add_argument("--video_length_tolerance_range", type=float,
                   default=2.0)
    p.add_argument("--shard_idx", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--max_errors_per_type", type=int, default=100)
    p.add_argument("--checkpoint_interval_sec", type=int, default=300)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--encode_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="VAE encode compute dtype (ref preprocesses bf16)")
    return p.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s: %(message)s")

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..configs import WAN_CONFIGS
    from ..data.t2v_dataset import T2VDataset
    from ..models import t5 as t5m
    from ..models import vae as vaem
    from ..models.tokenizer import load_tokenizer

    cfg = WAN_CONFIGS[args.task]
    os.makedirs(args.output_dir, exist_ok=True)
    latent_dir = os.path.join(args.output_dir, "latent")
    embed_dir = os.path.join(args.output_dir, "prompt_embed")
    os.makedirs(latent_dir, exist_ok=True)
    os.makedirs(embed_dir, exist_ok=True)

    # resumable processed set (ref preprocess_wan_dataset.py:100-135)
    processed_path = os.path.join(
        args.output_dir, f"processed_items_shard{args.shard_idx}.json")
    processed = set()
    if os.path.exists(processed_path):
        with open(processed_path) as f:
            processed = set(json.load(f))
        logging.info("resuming: %d items already processed", len(processed))

    def save_processed():
        with open(processed_path, "w") as f:
            json.dump(sorted(processed), f)

    def handler(signum, frame):
        logging.info("signal %d: saving processed set", signum)
        save_processed()
        sys.exit(0)

    prev_int = signal.signal(signal.SIGINT, handler)
    prev_term = signal.signal(signal.SIGTERM, handler)

    try:
        return _run(args, processed, save_processed)
    finally:
        signal.signal(signal.SIGINT, prev_int)
        signal.signal(signal.SIGTERM, prev_term)


def _run(args, processed, save_processed):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..configs import WAN_CONFIGS
    from ..data.t2v_dataset import T2VDataset
    from ..models import t5 as t5m
    from ..models import vae as vaem
    from ..models.tokenizer import load_tokenizer

    cfg = WAN_CONFIGS[args.task]
    latent_dir = os.path.join(args.output_dir, "latent")
    embed_dir = os.path.join(args.output_dir, "prompt_embed")

    # ---- models
    if args.model_path:
        from ..models.t5 import load_t5_checkpoint
        from ..models.vae_convert import load_vae_checkpoint

        vae_params = load_vae_checkpoint(
            os.path.join(args.model_path, cfg.vae_checkpoint), cfg.vae)
        t5_params = load_t5_checkpoint(
            os.path.join(args.model_path, cfg.t5_checkpoint), cfg.t5)
        tok_path = os.path.join(args.model_path, cfg.t5_tokenizer)
    else:
        logging.warning("random-init VAE/T5 (no --model_path)")
        keys = jax.random.split(jax.random.PRNGKey(args.seed), 2)
        vae_params = vaem.init_params(keys[0], cfg.vae)
        t5_params = t5m.init_params(keys[1], cfg.t5)
        tok_path = cfg.t5_tokenizer

    tokenizer = load_tokenizer(tok_path, seq_len=cfg.model.text_len,
                               vocab_size=cfg.t5.vocab_size)
    # encode in bf16 like the reference (preprocess_wan_dataset.py:373,
    # 446: the VAE/T5 run under bf16 autocast and latents are cached
    # bf16); --encode_dtype float32 restores the slow exact path
    enc_dt = jnp.dtype(args.encode_dtype)
    vae_encode = jax.jit(
        lambda p, v: vaem.encode(p, v.astype(enc_dt), cfg.vae))
    t5_encode = jax.jit(lambda p, ids, mask: t5m.encode(p, ids, mask,
                                                        cfg.t5))

    clip_params = clip_cfg = None
    if args.dataset == "i2v":
        from ..models import clip as clipm

        clip_cfg = clipm.CLIPVisionConfig()
        clip_ckpt = os.path.join(
            args.model_path or "",
            "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth")
        if args.model_path and os.path.exists(clip_ckpt):
            clip_params = clipm.load_clip_checkpoint(clip_ckpt, clip_cfg)
        else:
            logging.warning("random-init CLIP tower for i2v caching")
            clip_params = clipm.init_vision_params(
                jax.random.PRNGKey(args.seed + 2), clip_cfg)
        os.makedirs(os.path.join(args.output_dir, "y"), exist_ok=True)
        os.makedirs(os.path.join(args.output_dir, "clip_feature"),
                    exist_ok=True)

    bin_crop_sizes = None
    if args.crop_height and args.crop_width:
        bin_crop_sizes = [
            {"height": args.crop_height, "width": args.crop_width}] * 3
    dataset = T2VDataset(
        args.data_merge_path, num_frames=args.num_frames,
        train_fps=args.train_fps, max_height=args.max_height,
        max_width=args.max_width, drop_short_ratio=args.drop_short_ratio,
        video_length_tolerance_range=args.video_length_tolerance_range,
        bin_crop_sizes=bin_crop_sizes, seed=args.seed)

    error_counts = defaultdict(int)
    metadata_items = []
    last_save = time.time()

    for idx in range(len(dataset)):
        if idx % args.num_shards != args.shard_idx:
            continue
        item_key = dataset.cap_list[idx]["path"]
        name = os.path.splitext(os.path.basename(item_key))[0] + f"_{idx}"
        if item_key in processed:
            continue
        try:
            sample = dataset[idx]
            video = jnp.asarray(sample["pixel_values"][None])  # [1,C,T,H,W]
            latent = np.asarray(vae_encode(vae_params, video))[0]
            np.save(os.path.join(latent_dir, f"{name}.npy"),
                    latent.astype(np.float32))

            ids, mask = tokenizer([sample["text"]], return_mask=True)
            ctx = np.asarray(
                t5_encode(t5_params, jnp.asarray(ids), jnp.asarray(mask)),
                np.float32)[0]
            true_len = int(mask[0].sum())
            np.save(os.path.join(embed_dir, f"{name}.npy"),
                    ctx[:true_len])

            meta = {
                "latent_path": f"{name}.npy",
                "prompt_embed_path": f"{name}.npy",
                "caption": sample["text"],
                "length": int(latent.shape[1]),
                "aspect_ratio_bin":
                    sample["metadata"]["aspect_ratio_bin"],
            }

            if args.dataset == "i2v":
                from ..pipelines.image2video import build_i2v_conditioning

                pix = sample["pixel_values"]  # [3, T, H, W]
                frames = pix.shape[1]
                h_crop, w_crop = pix.shape[2], pix.shape[3]
                y, clip_fea = build_i2v_conditioning(
                    vae_params, clip_params,
                    jnp.asarray(pix[:, 0]), frames, (w_crop, h_crop),
                    cfg.vae, clip_cfg)
                np.save(os.path.join(args.output_dir, "y",
                                     f"{name}.npy"),
                        np.asarray(y, np.float32))
                np.save(os.path.join(args.output_dir, "clip_feature",
                                     f"{name}.npy"),
                        np.asarray(clip_fea[0], np.float32))
                meta["y_path"] = f"{name}.npy"
                meta["clip_feature_path"] = f"{name}.npy"

            metadata_items.append(meta)
            processed.add(item_key)
        except Exception as e:  # per-item fault tolerance (ref L556-567)
            etype = type(e).__name__
            error_counts[etype] += 1
            logging.warning("item %s failed (%s): %s", item_key, etype, e)
            if error_counts[etype] > args.max_errors_per_type:
                logging.error("too many %s errors; aborting", etype)
                break
        if time.time() - last_save > args.checkpoint_interval_sec:
            save_processed()
            last_save = time.time()

    save_processed()

    # merged annotation json + _latest symlink (ref L612-664); resumed
    # runs merge with the previous run's metadata so _latest stays the
    # full dataset view
    run_tag = datetime.now().strftime("%Y%m%d_%H%M%S")
    out_json = os.path.join(args.output_dir,
                            f"videos2caption_{run_tag}.json")
    prev = os.path.join(args.output_dir, "videos2caption_latest.json")
    if os.path.exists(prev):
        try:
            with open(prev) as f:
                old = json.load(f)
            seen = {m["latent_path"] for m in metadata_items}
            metadata_items = [m for m in old
                              if m["latent_path"] not in seen] \
                + metadata_items
        except Exception as e:
            logging.warning("could not merge previous metadata: %s", e)
    with open(out_json, "w") as f:
        json.dump(metadata_items, f, indent=1)
    latest = os.path.join(args.output_dir, "videos2caption_latest.json")
    if os.path.islink(latest) or os.path.exists(latest):
        os.remove(latest)
    os.symlink(os.path.basename(out_json), latest)

    stats = {"processed": len(processed), "errors": dict(error_counts)}
    with open(os.path.join(
            args.output_dir,
            f"preprocess_stats_shard{args.shard_idx}.json"), "w") as f:
        json.dump(stats, f)
    logging.info("preprocessing done: %s", stats)
    return out_json


if __name__ == "__main__":
    main()
