#!/bin/bash
# Round-3 study queue, part 3: the hybrid secondary read
# (nerf.env_tight_chroma — blurred luma x tight chroma), built from the
# etr scale-ladder decomposition. duo_cool is the chroma target; default
# (box) is the regression gate; duo probes two-source assignment; wall
# the weak-grazing-evidence scene.
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

run duo_cool etc
run default  etc
run duo      etc
run wall     etc
run duo_cool etc1
echo "=== $(date -u +%H:%M:%S) QUEUE3 COMPLETE" >> "$LOG"
