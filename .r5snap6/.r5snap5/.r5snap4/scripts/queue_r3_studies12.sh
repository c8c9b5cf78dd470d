#!/bin/bash
# Round-3 study queue, part 12: chroma-HEAD gates (attack #4 on the
# duo secondary-direction chroma collapse, after both loss-side tie
# families measured negative — NOTES.md "duo cross-source assignment").
# (a) duo main attack: etc_chrom0_ch + etc_chromic_ch (does the
#     structural view-independent spectrum fix the two-source
#     assignment?), plus ch alone for attribution;
# (b) single-source regression gates on the shipped best recipe
#     (etc_chromic_ch on duo_cool / wall / box) — the head removes
#     view-dependent spectrum capacity, so the no-harm check matters.
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

run duo      etc_chrom0_ch
run duo      etc_chromic_ch
run duo_cool etc_chromic_ch
run wall     etc_chromic_ch
run box      etc_chromic_ch
run duo      ch
echo "=== $(date -u +%H:%M:%S) QUEUE12 COMPLETE" >> "$LOG"
