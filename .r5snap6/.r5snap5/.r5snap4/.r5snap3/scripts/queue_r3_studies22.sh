#!/bin/bash
# Round-3 study queue, part 22: env_distill low-weight ladder. The 0.3
# weight DIVERGES on the shadow scene (LDR 16.2, SSIM 0.71 — the tie's
# gradient couples back through the shared march and wrecks the field,
# even as it erases the albedo shadow-baking). Complete the ladder at
# 0.1 / 0.03 before closing the question.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
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
  echo "=== $(date -u +%H:%M:%S) DONE  $variant @ $scene rc=$?" >> "$LOG"
}
run shadow ed01
run shadow ed003
echo "=== $(date -u +%H:%M:%S) QUEUE22 COMPLETE" >> "$LOG"
