#!/bin/bash
# Multi-host fine-tuning (parity: scripts/train/finetune_multi_node.sh).
# Run this same command on every TPU pod worker (e.g. via
# `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`);
# jax.distributed.initialize() discovers the coordinator from the TPU
# environment — no torchrun/MLP_WORKER_* plumbing.
python -m moviigen_tpu.cli.finetune \
    --task t2v-14B \
    --ckpt_dir ./Wan2.1-T2V-14B \
    --data_json_path data/preprocess/videos2caption_latest.json \
    --sp_size 8 \
    --train_batch_size 1 \
    --num_latent_t 21 \
    --gradient_checkpointing \
    --learning_rate 1e-6 \
    --max_train_steps 6000 \
    --checkpointing_steps 500 \
    --output_dir outputs/finetune
