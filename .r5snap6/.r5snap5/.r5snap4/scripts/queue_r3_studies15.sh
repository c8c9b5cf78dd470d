#!/bin/bash
# Round-3 study queue, part 15: occlusion generality gates on the new
# `shadow` scene (interior column + hard point-source shadows — the
# first scene where the irradiance integral must read the density
# field's VISIBILITY, and where the surface loss must agree with
# shadowed GT):
# (a) prod defaults (does the shipped recipe survive cast shadows?)
# (b) etc_chromic (the hdr preset — the tight-chroma secondary re-read
#     samples exactly the rays a shadowing occluder intercepts)
# (c) prod seeds 1/2 if (a) lands positive (seed robustness of the
#     occlusion claim) — queued unconditionally; cheap relative to the
#     information.
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

run shadow prod
run shadow etc_chromic
run shadow prod --seed 1
run shadow prod --seed 2
echo "=== $(date -u +%H:%M:%S) QUEUE15 COMPLETE" >> "$LOG"
