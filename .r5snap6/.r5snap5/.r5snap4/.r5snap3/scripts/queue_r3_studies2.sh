#!/bin/bash
# Round-3 study queue, part 2: the blur-dilution attack (env_tight_rgb)
# on the scenes where the attribution probe measured the dilution.
# Waits for queue 1 (pid file) before touching the chip.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

if [ -f /tmp/queue_r3.pid ]; then
  while kill -0 "$(cat /tmp/queue_r3.pid)" 2>/dev/null; do sleep 30; done
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

run duo_cool etr        # fine-scale color read where dilution was measured
run default  etr        # regression check on the flagship scene
run wall     etr        # the weak-grazing-evidence scene
run duo_cool etr1       # intermediate scale
run duo_cool etr_vcsm   # tight color + unsaturated-channel cross-view tie
run duo      etr
echo "=== $(date -u +%H:%M:%S) QUEUE2 COMPLETE" >> "$LOG"
