#!/bin/bash
# Train panonerf then mipnerf on a scene (reference scripts/run.sh:3-9).
# Usage: scripts/run.sh [DATA_PATH] [OUT_DIR] [extra dot-key overrides...]
set -e
DATA_PATH=${1:-./data/bathroom_0}
OUT_DIR=${2:-./exps/}
shift 2 2>/dev/null || shift $# 2>/dev/null || true

python train.py --data_path "$DATA_PATH" --out_dir "$OUT_DIR" \
    --config configs/panonerf.yaml "$@"

python train.py --data_path "$DATA_PATH" --out_dir "$OUT_DIR" \
    --config configs/mipnerf.yaml "$@"
