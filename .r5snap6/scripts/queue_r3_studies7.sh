#!/bin/bash
# Round-3 study queue, part 7:
# (a) illuminant-chroma GATE gates (loss.chrom_gate) — box/wall
#     regression + duo_cool match-chrom0 + duo composition;
# (b) duo etc_chrom0 seed robustness (the both-sources-ordered recipe);
# Run after queue6b (pass WAIT_PID to serialize on the chip).
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/studies_r3}
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

run default  chromg
run duo_cool chromg
run duo      etc_chromg
run wall     chromg
run duo      etc_chrom0 --seed 1
run duo      etc_chrom0 --seed 2
echo "=== $(date -u +%H:%M:%S) QUEUE7 COMPLETE" >> "$LOG"
