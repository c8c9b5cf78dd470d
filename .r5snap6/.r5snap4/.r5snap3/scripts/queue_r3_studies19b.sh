#!/bin/bash
# Repair of queues 18/19: the flagship box-room scene's variant key is
# `default` (the "box" label in NOTES is informal); re-run the gates
# that failed with KeyError('box').
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

run default etw
run default lr4
run default lr1e3
run default etc_chromic_lr4
run default lr4 --seed 1
run default lr4 --seed 2
echo "=== $(date -u +%H:%M:%S) QUEUE19B COMPLETE" >> "$LOG"
