#!/bin/bash
# Round-3 queued chip studies (relaunched after the /tmp wipe + tunnel
# outage — see NOTES.md "Queued for the chip").  Runs strictly
# sequentially: one real v5e chip.  Each line appends the hdr_study JSON
# to $ROOT_OUT/results.jsonl via tee so partial progress survives.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

run() {  # run <scene_variant> <hdr_study variant> [extra args...]
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

# 1. vc_sat_mask study (docs/knobs.md row pending)
run duo_cool vcsm
run duo      vcsm
run default  vcsm
run wall     vcsm
# 2. pnorm under the CURRENT recipe (vc_luma + guard postdate every
#    pnorm measurement): 3 box seeds + wall
run default  pnorm
run default  pnorm --seed 1
run default  pnorm --seed 2
run wall     pnorm
# 3. chromic on full duo and wall
run duo      chromic
run wall     chromic
# 4. chromic_em on duo_cool; vcsm+chromic combo on duo_cool
run duo_cool chromic_em
run duo_cool vcsm_chromic
echo "=== $(date -u +%H:%M:%S) QUEUE COMPLETE" >> "$LOG"
