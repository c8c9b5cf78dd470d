#!/bin/bash
# Round-3 study queue, part 13: chromatic-texture generality gates on
# the new `checker` scene (spatially-varying albedo chroma — the hard
# case for the albedo-chroma prior family, which was tuned entirely on
# constant-within-face-chroma scenes):
# (a) prod defaults (does the shipped recipe survive textured chroma?)
# (b) etc_chromic (the hdr preset — the compensated prior divides by a
#     stop-grad shading estimate; spatial albedo chroma is exactly what
#     could confuse that attribution)
# (c) chrom0 (prior fully off — isolates whether any regression is the
#     prior or the vc/saturation machinery)
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

run checker prod
run checker etc_chromic
run checker chrom0
echo "=== $(date -u +%H:%M:%S) QUEUE13 COMPLETE" >> "$LOG"
