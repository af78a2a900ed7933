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
# optional serving knobs:
#   TP=2            shard the model over a tensor-parallel mesh (7B on small chips)
#   QUANT=int8      weight-only int8 decode (~1.7x on v5e)
#   KV_DTYPE=int8   int8 KV cache (composes with the paged pool)
#   CONTINUOUS=1    continuous batching over the PAGED KV pool (vLLM engine
#                   model; BATCH slots, page size KV_BLOCK)
TP=${TP:-1}
QUANT=${QUANT:-}
KV_DTYPE=${KV_DTYPE:-}
CONTINUOUS=${CONTINUOUS:-}
KV_BLOCK=${KV_BLOCK:-128}
BATCH=${BATCH:-8}
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
    --tensor_parallel_size "$TP" \
    --batch_size "$BATCH" \
    ${QUANT:+--quantization "$QUANT"} \
    ${KV_DTYPE:+--kv_cache_dtype "$KV_DTYPE"} \
    ${CONTINUOUS:+--use_continuous_batching --kv_block_size "$KV_BLOCK"} \
    --max_new_tokens 1024

python -m time_r1_tpu.cli.eval_all --dataset "$DATASET" --model_name "$MODEL_NAME"
