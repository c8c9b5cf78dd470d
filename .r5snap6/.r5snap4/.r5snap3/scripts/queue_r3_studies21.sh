#!/bin/bash
# Re-run of default/lr1e3 (lost to a working-tree edit race: the run
# imported pano_mip_nerf.py mid-commit of the env_distill field).
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
LOG="$ROOT_OUT/queue.log"
if [ -n "${WAIT_PID:-}" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) START lr1e3 @ default (rerun)" >> "$LOG"
timeout 2700 python scripts/hdr_study.py \
    --scene_variant default --variants lr1e3 \
    --out "$ROOT_OUT/default" \
    > "$ROOT_OUT/default_lr1e3.json" 2>> "$LOG"
echo "=== $(date -u +%H:%M:%S) DONE  lr1e3 @ default (rerun) rc=$?" >> "$LOG"
echo "=== $(date -u +%H:%M:%S) QUEUE21 COMPLETE" >> "$LOG"
