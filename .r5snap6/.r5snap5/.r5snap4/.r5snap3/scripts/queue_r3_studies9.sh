#!/bin/bash
# Round-3 study queue, part 9:
# (a) the vc_chroma duo gates — the attribution probe isolated the
#     cross-source failure to secondary-direction chroma collapse of
#     the shared view-dependent head; the chroma-only cross-view tie
#     is the targeted fix (NOTES.md duo cross-source assignment);
# (b) vcc regression gates on the single-source recipes (duo_cool the
#     best-result scene, box the neutral-illumination scene);
# (c) etck2_chromic wall — K=2 measured full-S-level recovery at ~40%
#     of the re-read cost; compose with the chromic prior.
# Run after queue8 (pass WAIT_PID to serialize on the chip).
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

run duo      etc_chromic_vcc
run duo      etc_chrom0_vcc
run duo_cool etc_chromic_vcc
run wall     etck2_chromic
run default  etc_chromic_vcc
run wall     etc_chromic_vcc
echo "=== $(date -u +%H:%M:%S) QUEUE9 COMPLETE" >> "$LOG"
