#!/bin/bash
# Round-3 study queue, part 24: duo_swap position-control retry. The
# queue-23 duo_swap launch wedged pre-compile (healthy tunnel, zero
# progress for 13 min — killed; see NOTES round-3 session log) and the
# shadow-88k long-horizon run is dropped to round 4 for wall-clock.
# Chained after queue 22 (env_distill low-weight ladder).
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
LOG="$ROOT_OUT/queue.log"
mkdir -p "$ROOT_OUT"
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
run duo_swap etc_chrom0
echo "=== $(date -u +%H:%M:%S) QUEUE24 COMPLETE" >> "$LOG"
