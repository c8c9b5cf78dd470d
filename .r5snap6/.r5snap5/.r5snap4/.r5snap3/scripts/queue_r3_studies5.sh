#!/bin/bash
# Round-3 study queue, part 5: the duo (two opposite-chroma saturating
# sources) frontier. etc was HDR-neutral on duo at -3 dB LDR; the
# remaining suspects are the albedo-chroma prior (pushes each local
# illuminant's color into the jointly-lit floor's albedo — duo_cool
# chrom0 measured +2.46 vs prod -0.55) and the full-S tight re-read's
# secondary gradient pressure (etct reads 1/S the rows).
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

run duo etc_chrom0
run duo chrom0
run duo etct
echo "=== $(date -u +%H:%M:%S) QUEUE5 COMPLETE" >> "$LOG"
