#!/usr/bin/env bash
# Turnkey real-weights parity harness (VERDICT r2 #4).
# The day a Qwen2.5-VL / Time-R1 checkpoint lands:
#   MODEL=./ckpts/Time-R1-3B bash scripts/parity.sh
# runs (1) the reference demo flow + fixture diff, (2) layerwise activation
# comparison vs HF torch, (3) a 50-sample Charades shard + scoring vs the
# README.md:106 bar (zero-shot R1@0.5 >= 60.8).
set -euo pipefail

MODEL=${MODEL:-./ckpts/Time-R1-3B}
OUTDIR=${OUTDIR:-./logs/parity/$(basename "$MODEL")}
EXPECTED=${EXPECTED:-}   # committed demo fixture; empty -> records a candidate
N=${N:-50}

python -m time_r1_tpu.cli.parity \
    --model_base "$MODEL" \
    --output_dir "$OUTDIR" \
    --charades_n "$N" \
    ${EXPECTED:+--expected "$EXPECTED"}
