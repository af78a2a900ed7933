#!/usr/bin/env bash
# TimeRFT GRPO post-training recipe (parity: reference scripts/posttrain/train_rl.sh).
# One process drives the whole TPU slice via jax; no torchrun/deepspeed launchers.
# The trainer AUTO-BUILDS a (data, model) mesh over all visible devices:
# params/optimizer shard FSDP-style over the data axis (ZeRO-3 parity) and the
# P*G rollout rows shard over it too. Multi-host: set JAX_COORDINATOR_ADDRESS/
# JAX_NUM_PROCESSES/JAX_PROCESS_ID per host (torchrun rendezvous parity).
#
# TPU-only extras (opt in by appending):
#   --tensor_parallel_size N         model-axis width of the training mesh
#   --use_peft true --lora_r 16      adapter-only training, base doubles as the KL ref
#   --per_device_train_batch_size N  example-level DP: N prompts x G rollouts per step
#
# Rollouts default to weight-only int8 below (~1.9x faster decode; measured
# in bench.py). Same capability class as the reference's vLLM rollout server
# (which never bit-matches its DeepSpeed trainer forward either): the loss
# and ref logps are recomputed from the full-precision weights. Set
# ROLLOUT_QUANT="" for bf16 rollouts.
set -euo pipefail

export EXP_NAME=${EXP_NAME:-3b_kl_cot_gaussian_03_iouv2_2500_ME}
ROLLOUT_QUANT=${ROLLOUT_QUANT-int8}
export DEBUG_MODE=${DEBUG_MODE:-true}
export LOG_PATH=${LOG_PATH:-./logs/$EXP_NAME/$EXP_NAME.txt}

OUTDIR=./logs/$EXP_NAME
BASE_MODEL=${BASE_MODEL:-./ckpts/Qwen2.5-VL-3B-Instruct}

python -m time_r1_tpu.cli.train \
    --output_dir "$OUTDIR" \
    --model_name_or_path "$BASE_MODEL" \
    --train_data_path ./dataset/timer1/annotations/train_2k5.json \
    --dataset_name xxx \
    --max_prompt_length 8192 \
    --max_completion_length 200 \
    --num_generations 8 \
    --per_device_train_batch_size 1 \
    --gradient_accumulation_steps 2 \
    --data_seed 42 \
    --gradient_checkpointing true \
    --fix_vit true \
    --slide_window false \
    --num_train_epochs 5 \
    --run_name "$EXP_NAME" \
    --report_to tensorboard \
    --reward_funcs iou_v2 format \
    --temperature 1.0 \
    --prompt_type v1 \
    --is_curriculum_learning false \
    --logging_dir "$OUTDIR" \
    --logging_steps 1 \
    --save_steps 50 \
    --save_only_model true \
    ${ROLLOUT_QUANT:+--rollout_quantization "$ROLLOUT_QUANT"}
