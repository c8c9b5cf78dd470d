#!/bin/bash
# Round-3 study queue, part 4: the dominant-hit tight chroma read
# (nerf.env_tight_top1 — 1/S the tight re-read rows, measured -3.5% step
# cost vs etc's -15.6%). Quality gates: does top-1 chroma preserve etc's
# beyond-knee HDR on the three scenes where etc was measured?
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

run duo_cool etct
run default  etct
run wall     etct
echo "=== $(date -u +%H:%M:%S) QUEUE4 COMPLETE" >> "$LOG"
