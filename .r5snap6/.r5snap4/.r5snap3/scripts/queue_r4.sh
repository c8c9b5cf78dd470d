#!/bin/bash
# Round-4 chip-study queue runner (manifest-driven).
#
# Replaces the per-round queue_r3_studiesN.sh chain with ONE sequential
# runner that consumes a manifest file line by line, so runs can be
# appended/reordered while the queue is live. Each line:
#
#   SNAP OUT SCENE VARIANT SEED MAX_S [extra hdr_study args...]
#
#   SNAP   repo snapshot dir to execute from (codestability: edits to
#          /root/repo during the round must not perturb in-flight
#          studies; refresh the snapshot to pick up new knobs)
#   OUT    study output root (e.g. /root/repo/studies_r3)
#   SCENE  data/synthetic.py SCENE_VARIANTS entry
#   VARIANT hdr_study.py variant name
#   SEED   PRNG seed (0 = unsuffixed out dir)
#   MAX_S  overall wall deadline for one attempt (s)
#
# Robustness (round-3 advisor findings all addressed here):
#  * every attempt runs in its OWN process group (setsid) and both the
#    wedge kill and the deadline kill signal the WHOLE group — the
#    train.py grandchild can no longer leak as an orphan holding the
#    tunnel (advisor #1);
#  * the variant dir is removed before the FIRST attempt, so a stale
#    metrics.jsonl from a prior partial run cannot blind the wedge
#    watchdog (advisor #2);
#  * a wedge is signaled via an out-of-band sentinel file, not an exit
#    code that can collide with a real child status (advisor #3).
#
# Launch-wedge watchdog (NOTES.md round-3 "tunnel launch wedge"): a
# fresh TPU client can park in futex_wait at the backend handshake with
# no exception; healthy runs produce metrics.jsonl well inside ~6 min.
# If none appears WEDGE_S seconds after launch, the attempt's process
# group is killed and relaunched once in a clean process.
set -u
cd /root/repo
QDIR=${QDIR:-/root/repo/studies_r4}
Q="$QDIR/queue.list"
POS_F="$Q.pos"
LOG="$QDIR/queue.log"
WEDGE_S=${WEDGE_S:-420}
mkdir -p "$QDIR"
touch "$Q"
[ -f "$POS_F" ] || echo 0 > "$POS_F"

note() { echo "=== $(date -u +%H:%M:%S) $*" >> "$LOG"; }

# One launch of hdr_study in its own process group, with the wedge
# watchdog and the overall deadline both enforced by group kill.
# Returns the child's exit status; a wedge leaves the sentinel file.
attempt() {
  local snap=$1 out=$2 scene=$3 variant=$4 seed=$5 max_s=$6; shift 6
  local vdir="$out/$scene/$variant"
  [ "$seed" != 0 ] && vdir="$vdir-seed$seed"
  local mfile="$vdir/panonerf_0_1_2/metrics.jsonl"
  local sentinel="$vdir.wedge"
  local tag="${scene}_${variant}_s${seed}$(echo "$*" | tr -d ' -')"
  rm -f "$sentinel"
  PYTHONPATH="$snap:/root/.axon_site" setsid \
    python "$snap/scripts/hdr_study.py" \
      --scene_variant "$scene" --variants "$variant" --seed "$seed" \
      --out "$out/$scene" "$@" \
      > "$out/$tag.json" 2>> "$LOG" &
  local pid=$!
  local waited=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30; waited=$((waited + 30))
    if [ "$waited" -ge "$WEDGE_S" ] && [ ! -s "$mfile" ]; then
      note "WEDGE $variant @ $scene seed$seed (no metrics after ${waited}s) — killing group"
      touch "$sentinel"
      kill -TERM -- "-$pid" 2>/dev/null; sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 0
    fi
    if [ "$waited" -ge "$max_s" ]; then
      note "DEADLINE $variant @ $scene seed$seed (${waited}s > ${max_s}s) — killing group"
      kill -TERM -- "-$pid" 2>/dev/null; sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 124
    fi
  done
  wait "$pid"
}

run_one() {
  local snap=$1 out=$2 scene=$3 variant=$4 seed=$5 max_s=$6; shift 6
  local vdir="$out/$scene/$variant"
  [ "$seed" != 0 ] && vdir="$vdir-seed$seed"
  local sentinel="$vdir.wedge"
  note "START $variant @ $scene seed$seed $*"
  # Freshness: a stale partial run must not blind the wedge watchdog.
  rm -rf "$vdir"
  attempt "$snap" "$out" "$scene" "$variant" "$seed" "$max_s" "$@"
  local rc=$?
  if [ -e "$sentinel" ]; then
    rm -rf "$vdir"; rm -f "$sentinel"
    sleep 60
    note "RETRY $variant @ $scene seed$seed"
    attempt "$snap" "$out" "$scene" "$variant" "$seed" "$max_s" "$@"
    rc=$?
    [ -e "$sentinel" ] && note "WEDGE-TWICE $variant @ $scene seed$seed — giving up"
  fi
  note "DONE  $variant @ $scene seed$seed rc=$rc"
}

note "QUEUE-R4 RUNNER UP (pid $$)"
idle=0
while :; do
  pos=$(cat "$POS_F")
  total=$(grep -c . "$Q" 2>/dev/null || echo 0)
  if [ "$pos" -ge "$total" ]; then
    if [ -e "$Q.stop" ]; then note "QUEUE-R4 COMPLETE (stop file)"; break; fi
    idle=$((idle + 1))
    if [ "$idle" -ge 240 ]; then note "QUEUE-R4 COMPLETE (idle 2h)"; break; fi
    sleep 30; continue
  fi
  idle=0
  line=$(sed -n "$((pos + 1))p" "$Q")
  echo $((pos + 1)) > "$POS_F"
  [ -z "$line" ] && continue
  case "$line" in \#*) continue;; esac
  run_one $line
done
