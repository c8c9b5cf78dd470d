#!/bin/bash
# Round-3 study queue, part 11: re-run of the gates lost to the host
# restart (queue9/10 outputs lived outside the repo and were wiped
# before completion/recording):
# (a) the one-way stop-grad chroma tie (vccsg) duo gates — attack #2
#     on the secondary-direction chroma collapse (attack #1, the
#     symmetric tie, measured NEGATIVE x2: it drags the supervised
#     primary read into the collapse; the sg tie removes the
#     back-pressure path);
# (b) vccsg regression gates on the single-source best recipes
#     (duo_cool + wall etc_chromic);
# (c) wall etck2_chromic — compose the K=2 cost dial (full-S-level
#     wall HDR at 2/S re-read rows) with the chromic prior.
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

run duo      etc_chromic_vccsg
run duo      etc_chrom0_vccsg
run wall     etck2_chromic
run duo_cool etc_chromic_vccsg
run wall     etc_chromic_vccsg
echo "=== $(date -u +%H:%M:%S) QUEUE11 COMPLETE" >> "$LOG"
