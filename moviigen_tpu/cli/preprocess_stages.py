"""Split-stage preprocessing CLIs.

Parity targets: ``scripts/data_preprocess/preprocess_vae_latents.py``
(VAE-only pass → ``videos2caption_temp.json``),
``preprocess_text_embeddings.py`` (T5 pass over that json →
``videos2caption.json``), and
``preprocess_validation_text_embeddings.py`` (encode validation prompts).
The reference's split stages contain live ``breakpoint()`` debug calls
(SURVEY §2.3); these are clean reimplementations of the same dataflow.

Usage:
    python -m moviigen_tpu.cli.preprocess_stages vae --data_merge_path ...
    python -m moviigen_tpu.cli.preprocess_stages text --json_path ...
    python -m moviigen_tpu.cli.preprocess_stages validation --prompt_dir ...
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def _common(p):
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--task", type=str, default="t2v-14B")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)


def _parse_args(argv=None):
    ap = argparse.ArgumentParser(description="Split-stage preprocessing")
    sub = ap.add_subparsers(dest="stage", required=True)

    pv = sub.add_parser("vae", help="VAE latents only")
    _common(pv)
    pv.add_argument("--data_merge_path", type=str, required=True)
    pv.add_argument("--num_frames", type=int, default=81)
    pv.add_argument("--train_fps", type=int, default=16)
    pv.add_argument("--max_height", type=int, default=1080)
    pv.add_argument("--max_width", type=int, default=1920)
    pv.add_argument("--crop_height", type=int, default=None)
    pv.add_argument("--crop_width", type=int, default=None)
    pv.add_argument("--drop_short_ratio", type=float, default=1.0)
    pv.add_argument("--video_length_tolerance_range", type=float,
                    default=2.0)

    pt = sub.add_parser("text", help="T5 embeddings over a latent json")
    _common(pt)
    pt.add_argument("--json_path", type=str, required=True,
                    help="videos2caption_temp.json from the vae stage")
    pt.add_argument("--pad_to", type=int, default=0,
                    help="pad embeddings to this length (ref pads to 256)")

    pp = sub.add_parser("validation", help="encode validation prompts")
    _common(pp)
    pp.add_argument("--prompt_dir", type=str,
                    default="assets/valid_data_t2v")
    return ap.parse_args(argv)


def _load_t5(args, cfg):
    import jax

    from ..models import t5 as t5m
    from ..models.tokenizer import load_tokenizer

    if args.model_path:
        t5_params = t5m.load_t5_checkpoint(
            os.path.join(args.model_path, cfg.t5_checkpoint), cfg.t5)
        tok_path = os.path.join(args.model_path, cfg.t5_tokenizer)
    else:
        logging.warning("random-init T5 (no --model_path)")
        t5_params = t5m.init_params(jax.random.PRNGKey(args.seed), cfg.t5)
        tok_path = cfg.t5_tokenizer
    tokenizer = load_tokenizer(tok_path, seq_len=cfg.model.text_len,
                               vocab_size=cfg.t5.vocab_size)
    encode = jax.jit(
        lambda p, ids, mask: t5m.encode(p, ids, mask, cfg.t5))
    return t5_params, tokenizer, encode


def stage_vae(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from ..configs import WAN_CONFIGS
    from ..data.t2v_dataset import T2VDataset
    from ..models import vae as vaem

    cfg = WAN_CONFIGS[args.task]
    os.makedirs(os.path.join(args.output_dir, "latent"), exist_ok=True)

    if args.model_path:
        from ..models.vae_convert import load_vae_checkpoint

        vae_params = load_vae_checkpoint(
            os.path.join(args.model_path, cfg.vae_checkpoint), cfg.vae)
    else:
        logging.warning("random-init VAE (no --model_path)")
        vae_params = vaem.init_params(jax.random.PRNGKey(args.seed),
                                      cfg.vae)
    # bf16 encode like the reference preprocessing autocast
    # (preprocess_vae_latents.py runs under the same bf16 policy)
    vae_encode = jax.jit(
        lambda p, v: vaem.encode(p, v.astype(jnp.bfloat16), cfg.vae))

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

    items = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        name = os.path.splitext(
            os.path.basename(sample["path"]))[0] + f"_{idx}"
        latent = np.asarray(vae_encode(
            vae_params, jnp.asarray(sample["pixel_values"][None])))[0]
        np.save(os.path.join(args.output_dir, "latent", f"{name}.npy"),
                latent.astype(np.float32))
        items.append({
            "latent_path": f"{name}.npy",
            "caption": sample["text"],
            "length": int(latent.shape[1]),
            "aspect_ratio_bin": sample["metadata"]["aspect_ratio_bin"],
        })
    out = os.path.join(args.output_dir, "videos2caption_temp.json")
    with open(out, "w") as f:
        json.dump(items, f, indent=1)
    logging.info("vae stage: %d items → %s", len(items), out)
    return out


def stage_text(args):
    import numpy as np
    import jax.numpy as jnp

    from ..configs import WAN_CONFIGS

    cfg = WAN_CONFIGS[args.task]
    t5_params, tokenizer, encode = _load_t5(args, cfg)
    os.makedirs(os.path.join(args.output_dir, "prompt_embed"),
                exist_ok=True)

    with open(args.json_path) as f:
        items = json.load(f)
    for item in items:
        name = os.path.splitext(item["latent_path"])[0]
        ids, mask = tokenizer([item["caption"]], return_mask=True)
        ctx = np.asarray(encode(t5_params, jnp.asarray(ids),
                                jnp.asarray(mask)), np.float32)[0]
        true_len = int(mask[0].sum())
        emb = ctx[:true_len]
        if args.pad_to and emb.shape[0] < args.pad_to:
            emb = np.concatenate(
                [emb, np.zeros((args.pad_to - emb.shape[0],
                                emb.shape[1]), emb.dtype)])
        np.save(os.path.join(args.output_dir, "prompt_embed",
                             f"{name}.npy"), emb)
        item["prompt_embed_path"] = f"{name}.npy"
    out = os.path.join(args.output_dir, "videos2caption.json")
    with open(out, "w") as f:
        json.dump(items, f, indent=1)
    logging.info("text stage: %d items → %s", len(items), out)
    return out


def stage_validation(args):
    import glob

    import numpy as np
    import jax.numpy as jnp

    from ..configs import WAN_CONFIGS

    cfg = WAN_CONFIGS[args.task]
    t5_params, tokenizer, encode = _load_t5(args, cfg)
    out_dir = os.path.join(args.output_dir, "validation_embed")
    os.makedirs(out_dir, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.prompt_dir, "*.txt"))):
        text = open(path).read().strip()
        name = os.path.splitext(os.path.basename(path))[0]
        ids, mask = tokenizer([text], return_mask=True)
        ctx = np.asarray(encode(t5_params, jnp.asarray(ids),
                                jnp.asarray(mask)), np.float32)[0]
        np.save(os.path.join(out_dir, f"{name}.npy"),
                ctx[: int(mask[0].sum())])
    logging.info("validation embeddings → %s", out_dir)
    return out_dir


def main(argv=None):
    args = _parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s] %(levelname)s: %(message)s")
    if args.stage == "vae":
        return stage_vae(args)
    if args.stage == "text":
        return stage_text(args)
    return stage_validation(args)


if __name__ == "__main__":
    main()
