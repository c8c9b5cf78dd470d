#!/bin/bash
# Round-3 study queue, part 10: the one-way (stop-grad) chroma tie duo
# gates — attack #2 on the secondary-direction chroma collapse (the
# symmetric tie, attack #1, measured NEGATIVE: it drags the primary
# into the collapse). Plus a duo_cool regression gate for the sg tie
# on the best single-source recipe.
# Run after queue9 (pass WAIT_PID to serialize on the chip).
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

run duo      etc_chromic_vccsg
run duo      etc_chrom0_vccsg
run duo_cool etc_chromic_vccsg
run wall     etc_chromic_vccsg
echo "=== $(date -u +%H:%M:%S) QUEUE10 COMPLETE" >> "$LOG"
