#!/bin/bash
# Multi-chip inference example (parity: scripts/inference/inference.sh —
# 4-way Ulysses SP + sharded DiT/T5 params). On a TPU pod slice the mesh
# spans all visible chips; jax.distributed initializes automatically on
# multi-host environments.
python -m moviigen_tpu.cli.generate \
    --task t2v-14B \
    --size "1280*720" \
    --ckpt_dir ./Wan2.1-T2V-14B \
    --ulysses_size 4 \
    --ring_size 1 \
    --dit_fsdp --t5_fsdp \
    --sample_steps 50 \
    --sample_shift 5.0 \
    --sample_guide_scale 5.0 \
    --prompt "Two anthropomorphic cats in comfy boxing gear and bright gloves fight intensely on a spotlighted stage."
