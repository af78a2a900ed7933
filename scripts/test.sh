#!/usr/bin/env bash
# Sharded benchmark eval (parity: reference scripts/test.sh).
# The shard-by-index + jsonl merge pattern is kept: launch one process per
# host/chip with CURR/TOTAL, then score with eval_all.
set -euo pipefail

MODEL=${MODEL:-./ckpts/Time-R1-3B}
MODEL_NAME=${MODEL_NAME:-$(basename "$MODEL")}
DATASET=${DATASET:-charades}
SPLIT=${SPLIT:-test}
TOTAL=${TOTAL:-1}
CURR=${CURR:-0}
OUTDIR=./logs/eval/$MODEL_NAME/$DATASET

python -m time_r1_tpu.cli.evaluate \
    --model_base "$MODEL" \
    --datasets "$DATASET" \
    --split "$SPLIT" \
    --output_dir "$OUTDIR" \
    --curr_idx "$CURR" \
    --total_idx "$TOTAL" \
    --use_r1_thinking_prompt \
    --use_vllm_inference \
    --max_new_tokens 1024

python -m time_r1_tpu.cli.eval_all --dataset "$DATASET" --model_name "$MODEL_NAME"
