#!/bin/bash
# Round-4 carryover queue: the round-3 chip studies whose results were
# lost to a host restart (queues 20/21/23) or to the tunnel launch
# wedge (NOTES.md round-3 env_distill section), re-pointed at what the
# recovered ladder learned (ed01 is the working env_distill weight —
# 0.3 diverges).
#
# Launch-wedge guard: a fresh train.py client can wedge pre-compile
# (futex_wait, <=1 tunnel connection, no metrics.jsonl). Each run gets
# a watchdog: if its metrics.jsonl has not appeared WEDGE_S seconds
# after launch, the attempt is killed and relaunched once.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
LOG="$ROOT_OUT/queue.log"
WEDGE_S=${WEDGE_S:-420}
mkdir -p "$ROOT_OUT"
if [ -n "${WAIT_PID:-}" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi

attempt() {
  local scene=$1 variant=$2; shift 2
  local mfile="$ROOT_OUT/$scene/$variant/panonerf_0_1_2/metrics.jsonl"
  timeout 2700 python scripts/hdr_study.py \
      --scene_variant "$scene" --variants "$variant" \
      --out "$ROOT_OUT/$scene" "$@" \
      > "$ROOT_OUT/${scene}_${variant}$(echo "$*" | tr -d ' -')".json \
      2>> "$LOG" &
  local pid=$!
  local waited=0
  while [ -d "/proc/$pid" ]; do
    sleep 30; waited=$((waited + 30))
    if [ "$waited" -ge "$WEDGE_S" ] && [ ! -s "$mfile" ]; then
      echo "=== $(date -u +%H:%M:%S) WEDGE $variant @ $scene (no metrics after ${waited}s) — killing" >> "$LOG"
      pkill -P "$pid" 2>/dev/null; kill "$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 9
    fi
  done
  wait "$pid"
}

run() {
  local scene=$1 variant=$2; shift 2
  echo "=== $(date -u +%H:%M:%S) START $variant @ $scene $*" >> "$LOG"
  attempt "$scene" "$variant" "$@"
  local rc=$?
  if [ "$rc" -eq 9 ]; then
    rm -rf "$ROOT_OUT/$scene/$variant"
    sleep 60
    echo "=== $(date -u +%H:%M:%S) RETRY $variant @ $scene" >> "$LOG"
    attempt "$scene" "$variant" "$@"
    rc=$?
  fi
  echo "=== $(date -u +%H:%M:%S) DONE  $variant @ $scene rc=$rc" >> "$LOG"
}

# env_distill ladder completion + gates at the working weight (0.1).
run shadow ed003
run default ed01
run shadow etc_chromic_ed01
# Lost round-3 confirmations.
run duo_swap etc_chrom0
run default lr1e3
run shadow etc_chromic --steps 88000
echo "=== $(date -u +%H:%M:%S) QUEUE-R4-CARRYOVER COMPLETE" >> "$LOG"
