#!/bin/bash
# Round-3 study queue, part 20: stochastic per-direction distillation
# (loss.env_distill) — the occlusion-fog attack that supervises the
# blurred scale PER DIRECTION (none of the 6 prior attacks did).
# First a bounded end-to-end smoke with the knob on (the verify drive
# for the new code path), then the 44k gates: weight ladder on the
# shadow scene, box regression, preset composition.
set -u
cd /root/repo
ROOT_OUT=${ROOT_OUT:-/root/repo/studies_r3}
mkdir -p "$ROOT_OUT"
LOG="$ROOT_OUT/queue.log"

if [ -n "${WAIT_PID:-}" ]; then
  while [ -d "/proc/$WAIT_PID" ]; do sleep 30; done
fi

echo "=== $(date -u +%H:%M:%S) START ed-smoke" >> "$LOG"
timeout 900 python train.py --data_path /tmp/scene_shadow \
  --out_dir /tmp/exp_ed_smoke --config configs/panonerf.yaml \
  train.factor 1 train.sample_num "'n0_1_2'" train.batch_size 256 \
  nerf.num_samples 16 nerf.num_env_samples 4 nerf.num_ray_samples 4 \
  nerf.env_distill_samples 8 loss.env_distill 0.3 \
  optimizer.max_steps 200 val.check_every_n_epoch 1000 \
  val.chunk_size 1024 log_every_n_step 50 \
  > "$ROOT_OUT/ed_smoke.log" 2>&1
echo "=== $(date -u +%H:%M:%S) DONE  ed-smoke rc=$?" >> "$LOG"

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

run shadow ed03
run shadow ed1
run default ed03
run shadow etc_chromic_ed03
echo "=== $(date -u +%H:%M:%S) QUEUE20 COMPLETE" >> "$LOG"
