#!/usr/bin/env bash
# TimeRFT sample-filtering loop (parity: reference scripts/posttrain/train_rl_SF.sh).
# The 5-round train → self-eval → difficulty → filter loop runs as ONE driver
# (time_r1_tpu.cli.train_sf) instead of three programs per round.
set -euo pipefail

EXP_NAME=${EXP_NAME:-3b_sf_0070_iouv2}
BASE_MODEL=${BASE_MODEL:-./ckpts/Qwen2.5-VL-3B-Instruct}

python -m time_r1_tpu.cli.train_sf \
    --model_name_or_path "$BASE_MODEL" \
    --exp_dir ./logs/$EXP_NAME \
    --initial_data ./dataset/timer1/annotations/train_2k5.json \
    --rounds 5 \
    --k 2500 \
    --filter_task 0070_all \
    --num_generations 8 \
    --max_completion_length 20 \
    --reward_funcs iou_v2 format
