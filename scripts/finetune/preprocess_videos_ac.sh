#!/usr/bin/env bash
# Offline video preprocessing for ActivityNet (parity: reference
# scripts/finetune/preprocess_videos_ac.sh).
set -euo pipefail

python -m time_r1_tpu.cli.preprocess_videos \
    --dataset activitynet \
    --train_data_path ./dataset/activitynet/annotations/sentence_temporal_grounding/train.json \
    --video_folder ./dataset/activitynet/videos \
    --max_pix_size 3584 \
    --min_pix_size 16 \
    --num_workers 16
