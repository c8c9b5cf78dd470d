#!/bin/bash
# Round-3 study queue, part 19: hotter-LR 44k quality gates. Queue-17
# time-to-25dB probes measured lr_init 4e-4 at 2000 steps and 1e-3 at
# 1000 steps vs the shipped 2e-4's 5000 (same protocol/seed). A default
# change gates on endpoint quality: box (flagship, x3 seeds at 4e-4),
# wall (the divergence-prone scene), the hdr preset composition, and
# the 1e-3 point on box (is the frontier monotone or does the HDR
# machinery destabilize?).
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

if [ -n "${WAIT_PID:-}" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi

run() {
  local scene=$1 variant=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $variant @ $scene $*" >> "$LOG"
  timeout 2700 python scripts/hdr_study.py \
      --scene_variant "$scene" --variants "$variant" \
      --out "$ROOT_OUT/$scene" "$@" \
      > "$ROOT_OUT/${scene}_${variant}$(echo "$*" | tr -d ' -')".json \
      2>> "$LOG"
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) DONE  $variant @ $scene rc=$rc" >> "$LOG"
}

run box lr4
run box lr1e3
run wall lr4
run box etc_chromic_lr4
run box lr4 --seed 1
run box lr4 --seed 2
echo "=== $(date -u +%H:%M:%S) QUEUE19 COMPLETE" >> "$LOG"
