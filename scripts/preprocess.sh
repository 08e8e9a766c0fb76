#!/bin/bash
# Preprocessing example (parity: scripts/data_preprocess/preprocess.sh —
# 81 frames @ 1920x1080). Shard across hosts with --shard_idx/--num_shards.
python -m moviigen_tpu.cli.preprocess \
    --data_merge_path data/merge.txt \
    --output_dir data/preprocess \
    --task t2v-14B \
    --model_path ./Wan2.1-T2V-14B \
    --num_frames 81 \
    --train_fps 16 \
    --max_height 1080 \
    --max_width 1920
