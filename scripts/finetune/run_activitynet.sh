#!/usr/bin/env bash
# Downstream ActivityNet fine-tune (parity: reference scripts/finetune/run_activitynet.sh).
set -euo pipefail

EXP_NAME=${EXP_NAME:-activitynet_ft}
BASE_MODEL=${BASE_MODEL:-./ckpts/Time-R1-3B}

python -m time_r1_tpu.cli.finetune \
    --output_dir ./logs/$EXP_NAME \
    --model_name_or_path "$BASE_MODEL" \
    --train_data_path ./dataset/activitynet/annotations/sentence_temporal_grounding/train.json \
    --video_folder ./dataset/activitynet/videos \
    --preprocessed_data_path ./activitynet_preprocessed_data_maxpix_3584 \
    --max_completion_length 200 \
    --num_generations 8 \
    --gradient_accumulation_steps 2 \
    --reward_funcs iou_v2 format \
    --beta 0.0 \
    --use_grpo false \
    --temperature 1.0 \
    --prompt_type v1 \
    --fix_vit true \
    --num_train_epochs 1 \
    --save_steps 50
