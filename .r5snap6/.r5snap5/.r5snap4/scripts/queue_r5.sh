#!/bin/bash
# Round-5 chip-study queue runner (manifest-driven).
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
QDIR=${QDIR:-/root/repo/studies_r5}
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
    # Early wedge check (round-5): a healthy study prints its [data]
    # line to the tag log inside ~90 s; a handshake wedge never prints
    # anything. Cheaper than waiting the full metrics window.
    if [ "$waited" -ge "${CMD_WEDGE_S:-180}" ] \
        && [ "$(wc -c < "$out/$tag.json" 2>/dev/null || echo 0)" -lt 30 ]; then
      note "WEDGE-EARLY $variant @ $scene seed$seed (no output after ${waited}s) — killing group"
      touch "$sentinel"
      kill -TERM -- "-$pid" 2>/dev/null; sleep 10
      kill -KILL -- "-$pid" 2>/dev/null
      wait "$pid" 2>/dev/null
      return 0
    fi
    # (round-5) NO metrics-based wedge check beyond the early one: a
    # run that printed its [data] line completed the handshake, and a
    # NEW variant's first compile can legitimately exceed the old 420 s
    # metrics window (the ilf gate was killed mid-compile by it). A
    # post-handshake hang burns the per-line deadline instead.
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
  local rc=0 try
  for try in 1 2 3 4; do
    attempt "$snap" "$out" "$scene" "$variant" "$seed" "$max_s" "$@"
    rc=$?
    [ -e "$sentinel" ] || break
    # Round-5: the handshake wedge rate reached ~3/4 — retry up to 3x.
    rm -rf "$vdir"; rm -f "$sentinel"
    sleep 30
    [ "$try" = 4 ] && { note "WEDGE-x4 $variant @ $scene seed$seed — giving up"; break; }
    note "RETRY $try $variant @ $scene seed$seed"
  done
  note "DONE  $variant @ $scene seed$seed rc=$rc"
}

note "QUEUE-R5 RUNNER UP (pid $$)"
idle=0
while :; do
  pos=$(cat "$POS_F")
  total=$(grep -c . "$Q" 2>/dev/null || echo 0)
  if [ "$pos" -ge "$total" ]; then
    if [ -e "$Q.stop" ]; then note "QUEUE-R5 COMPLETE (stop file)"; break; fi
    idle=$((idle + 1))
    if [ "$idle" -ge 240 ]; then note "QUEUE-R5 COMPLETE (idle 2h)"; break; fi
    sleep 30; continue
  fi
  idle=0
  line=$(sed -n "$((pos + 1))p" "$Q")
  echo $((pos + 1)) > "$POS_F"
  [ -z "$line" ] && continue
  case "$line" in \#*) continue;; esac
  case "$line" in
    CMD\ *)
      # Generic command line: "CMD <logfile> <deadline_s> <command...>".
      # Round-5 finding: direct chip launches from the build session wedge
      # at the tunnel handshake (4/4 attempts, flat ~11 s CPU in
      # futex_wait); runner children wedge too at the NOTES ~3/4 session
      # rate — so CMD gets the same watchdog shape as hdr_study runs: if
      # the log grows no real output within WEDGE_S, kill the group and
      # retry once. "Real output" = bytes beyond the two xla_bridge
      # warnings every launch prints (~260 bytes).
      set -- $line
      cmd_log=$2; cmd_deadline=$3; shift 3
      for cmd_try in 1 2 3 4; do
        note "CMD START (try $cmd_try) $* (log $cmd_log, deadline ${cmd_deadline}s)"
        ( cd /root/repo && exec setsid timeout "$cmd_deadline" "$@" \
            > "$cmd_log" 2>&1 ) &
        cmd_pid=$!
        cmd_waited=0; cmd_wedged=0
        while kill -0 "$cmd_pid" 2>/dev/null; do
          sleep 30; cmd_waited=$((cmd_waited + 30))
          # A healthy chip job prints SOMETHING beyond the two
          # xla_bridge warnings (~265 B) inside ~90 s (train.py's data
          # line; bench_quality's startup line) — 180 s is enough, and
          # halves the cost of each wedge retry vs the 420 s study
          # window.
          if [ "$cmd_waited" -ge "${CMD_WEDGE_S:-180}" ] \
              && [ "$(wc -c < "$cmd_log" 2>/dev/null || echo 0)" -lt 330 ]; then
            note "CMD WEDGE (no output after ${cmd_waited}s) — killing group"
            cmd_wedged=1
            kill -TERM -- "-$cmd_pid" 2>/dev/null; sleep 5
            kill -KILL -- "-$cmd_pid" 2>/dev/null
            break
          fi
        done
        wait "$cmd_pid" 2>/dev/null
        cmd_rc=$?
        if [ "$cmd_wedged" = 0 ]; then break; fi
        sleep 30
      done
      note "CMD DONE rc=$cmd_rc $*"
      continue;;
  esac
  run_one $line
done
