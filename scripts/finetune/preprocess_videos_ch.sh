#!/usr/bin/env bash
# Offline video preprocessing for Charades (parity: reference
# scripts/finetune/preprocess_videos_ch.sh).
set -euo pipefail

python -m time_r1_tpu.cli.preprocess_videos \
    --dataset charades \
    --train_data_path ./dataset/charades/Charades_anno/Charades_sta_train.json \
    --video_folder ./dataset/charades/Charades_v1 \
    --max_pix_size 3584 \
    --min_pix_size 16 \
    --num_workers 16
