#!/bin/bash
# Round-3 study queue, part 16: occlusion attack ladder on the `shadow`
# scene. The shadow probe on the prod 44k checkpoint measured pred
# irradiance contrast 1.10 vs GT 4.91 with the blurred-scale composite a
# near-uniform ~0.65-luma fog along every secondary direction (GT: 0.17
# walls / 8.2 emitter) — the known blur-dilution/env-scale decoupling,
# now costing VISIBILITY. Attacks, all existing knobs:
# (a) envrs — two-level secondary march: placement from the blurred
#     pass, radiance from a tight re-march at the primary-supervised
#     scale where real density (the column) lives. The structural
#     candidate for visibility.
# (b) e10 — reference-default S=10 secondary march (the shipped S=5 was
#     quality-gated on convex scenes only; 2-unit sample spacing steps
#     over the 0.5-thick column).
# (c) etr — full tight-scale radiance read (carries intensity, not just
#     chroma, at the scale that resolves the column).
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

run shadow envrs
run shadow e10
run shadow etr
echo "=== $(date -u +%H:%M:%S) QUEUE16 COMPLETE" >> "$LOG"
