#!/bin/bash
# Round-3 study queue, part 23:
# (a) duo_swap etc_chrom0 — the position-control for the closed duo
#     chroma ladder: same two emitter positions, spectra exchanged. The
#     information-limit conclusion predicts the WARM illuminant wins
#     the secondary-chroma collapse regardless of position; if instead
#     the CEILING source always orders, evidence geometry drives the
#     assignment and the ladder's conclusion needs revising.
# (b) shadow etc_chromic at 88k — long-horizon stability of the hdr
#     preset on the occlusion scene (the box 88k extension held; the
#     shadow scene has harder geometry).
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
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
  echo "=== $(date -u +%H:%M:%S) DONE  $variant @ $scene rc=$?" >> "$LOG"
}
run duo_swap etc_chrom0
run shadow etc_chromic --steps 88000
echo "=== $(date -u +%H:%M:%S) QUEUE23 COMPLETE" >> "$LOG"
