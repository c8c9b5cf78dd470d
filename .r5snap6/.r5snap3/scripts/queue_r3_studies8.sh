#!/bin/bash
# Round-3 study queue, part 8:
# (a) env_tight_topk gates — wall is the decisive scene (etct's argmax
#     read under-read the boundary-straddling emitter, ratio 0.737 vs
#     etc 1.003): does K=2/4 recover it at a fraction of full-S cost?
# (b) duo etc_chrom0 seed robustness (the both-sources-ordered duo
#     recipe; seeds 1/2 were queued in part 7 and lost to the restart);
# (c) wall chromg (interrupted by the restart — completes the chromg
#     matrix; chromg is already losing on box/duo_cool/duo);
# (d) etck4_chromic composition gates if (a) is promising.
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

run wall     etck4
run wall     etck2
run duo      etc_chrom0 --seed 1
run duo      etc_chrom0 --seed 2
run wall     chromg
run default  etck4_chromic
run duo_cool etck4_chromic
run wall     etck4_chromic
echo "=== $(date -u +%H:%M:%S) QUEUE8 COMPLETE" >> "$LOG"
