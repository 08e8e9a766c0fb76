#!/bin/bash
# Fine-tuning example (parity: scripts/train/finetune.sh — 8-way SP,
# batch 1/chip, grad checkpointing, bf16 compute, lr 1e-6).
python -m moviigen_tpu.cli.finetune \
    --task t2v-14B \
    --ckpt_dir ./Wan2.1-T2V-14B \
    --data_json_path data/preprocess/videos2caption_latest.json \
    --sp_size 8 \
    --train_batch_size 1 \
    --num_latent_t 21 \
    --gradient_checkpointing \
    --learning_rate 1e-6 \
    --weighting_scheme uniform \
    --max_train_steps 6000 \
    --checkpointing_steps 500 \
    --gradient_accumulation_steps 1 \
    --output_dir outputs/finetune
