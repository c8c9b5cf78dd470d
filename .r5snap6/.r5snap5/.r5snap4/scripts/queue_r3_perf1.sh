#!/bin/bash
# Round-3 perf probe: batch sweep between the 512 operating point and the
# 1024 fusion-window cliff (round-1 cliff study measured 2.9x per-op time
# at 512->1024 but never probed intermediates). If an intermediate batch
# clears >10% it becomes a candidate default pending a rays-equivalent
# quality re-gate.
set -u
cd /root/repo
OUT=${OUT:-/root/studies_r3/perf_batch_sweep.txt}
: > "$OUT"
for B in 512 640 768 896 1024; do
  timeout 1200 python scripts/bench_ab.py "" --batch "$B" --scan 8 \
      --hparam nerf.num_samples=56 --hparam nerf.num_env_samples=5 \
      --compiler_opt xla_tpu_scoped_vmem_limit_kib=24576 --repeat 2 \
      2>/dev/null | grep "rays/s" >> "$OUT"
done
echo "PERF1 COMPLETE" >> "$OUT"
