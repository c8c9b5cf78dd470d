#!/bin/bash
# Round-3 study queue, part 18: env_tight_weights (etw) occlusion gates.
# The knob composites the secondary march entirely at the tight scale
# (radiance + transmittance from the tight re-read at blurred-placed
# samples) — built from the shadow-probe finding that the blurred-scale
# composite is a per-direction fog (contrast 1.10 vs GT 4.91).
# (a) shadow etw — the target scene;
# (b) shadow etw_e10 — + finer placement (S=5 uniform spacing can step
#     over the 0.5-wide column entirely);
# (c) box etw — convex-scene regression gate (does swapping the
#     transmittance scale break the HDR recovery the blurred march
#     carries there?).
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

run shadow etw
run shadow etw_e10
run box etw
echo "=== $(date -u +%H:%M:%S) QUEUE18 COMPLETE" >> "$LOG"
