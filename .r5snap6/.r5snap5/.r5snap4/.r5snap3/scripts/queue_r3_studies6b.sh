#!/bin/bash
# Round-3 study queue, part 6b: clean relaunch of the etc_chromic gates
# (the first queue6 got double-launched and its box/wall outputs were
# cross-contaminated — killed and re-run from scratch), then the batch
# sweep perf probe that never started.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

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

run default  etc_chromic
run wall     etc_chromic
run duo_cool etc_chromic --seed 1
run duo_cool etc_chromic --seed 2

# Perf probe: batch sweep 512..1024 (committed in queue_r3_perf1.sh but
# never launched). Runs after the quality gates so it owns the chip.
bash scripts/queue_r3_perf1.sh
echo "=== $(date -u +%H:%M:%S) QUEUE6B COMPLETE" >> "$LOG"
