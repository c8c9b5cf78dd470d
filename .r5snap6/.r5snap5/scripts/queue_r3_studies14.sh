#!/bin/bash
# Round-3 study queue, part 14:
# (a) The two queue-12 gates lost to a scene-key typo ('box' is not a
#     SCENE_VARIANTS entry; the flagship box room is 'default'): the
#     chroma-head knob on the single-source flagship scene, alone and
#     composed with the hdr-preset recipe. The head is already measured
#     NEGATIVE on duo (its target scene) — these document what it does
#     on the scene class everything else is tuned on, for the knob row.
# (b) Checker-scene seed robustness for the hdr preset (etc_chromic):
#     the textured-chroma generality gate passed at seed 0 (+1.42,
#     ordered spectrum); 2 more seeds make the claim seed-robust the
#     way every other shipped claim is.
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

run default ch
run default etc_chromic_ch
run checker etc_chromic --seed 1
run checker etc_chromic --seed 2
echo "=== $(date -u +%H:%M:%S) QUEUE14 COMPLETE" >> "$LOG"
