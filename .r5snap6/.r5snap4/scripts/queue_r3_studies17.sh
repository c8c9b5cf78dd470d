#!/bin/bash
# Round-3 study queue, part 17: time-to-quality (25 dB LDR ws-PSNR)
# schedule probes. The anchored row (BASELINE.md) is 78.4 s / 3000 steps
# at the shipped schedule (lr_init 2e-4, log-decay to 2e-5, delay 120).
# Probe whether a hotter start reaches the target in fewer steps — a
# default change would need full 44k quality re-gates, so these ship as
# measurements first.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

if [ -n "${WAIT_PID:-}" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi

run() {
  local tag=$1; shift
  echo "=== $(date -u +%H:%M:%S) START bench_quality $tag" >> "$LOG"
  timeout 1800 python scripts/bench_quality.py --max_steps 8000 "$@" \
      > "$ROOT_OUT/ttq_${tag}.json" 2>> "$LOG"
  echo "=== $(date -u +%H:%M:%S) DONE  bench_quality $tag rc=$?" >> "$LOG"
}

run base
run lr4     --opts optimizer.lr_init 4e-4
run lr1e3   --opts optimizer.lr_init 1e-3
run lr4f4   --opts optimizer.lr_init 4e-4 optimizer.lr_final 4e-5
echo "=== $(date -u +%H:%M:%S) QUEUE17 COMPLETE" >> "$LOG"
