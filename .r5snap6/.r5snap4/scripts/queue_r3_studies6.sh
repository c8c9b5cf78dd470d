#!/bin/bash
# Round-3 study queue, part 6: etc_chromic gates. The composition
# recovered duo_cool's full per-channel spectrum (+4.43 HDR, pred
# 6.47/7.98/8.60 vs GT 6.5/8/9.5) and brought duo to ~0; chromic ALONE
# was negative on the near-neutral box scene, so the composition needs
# its own box regression gate + wall gate + duo_cool seed robustness.
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
echo "=== $(date -u +%H:%M:%S) QUEUE6 COMPLETE" >> "$LOG"
