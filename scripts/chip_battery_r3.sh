#!/bin/bash
# Round-3 chip battery: price the scatter-free megaq machine rewrite.
# Round-2 reference points (same corpus/shapes, docs/PERF_NOTES.md):
#   megaq 4,584 reads/s | mega 5,415 | host 9,069 | hybrid@0.25 11,118
# Run SOLO (one chip grant per process; ~30 s release between runs).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/battery_r3.log}
: > "$LOG"
run() {
  name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 1200 env "$@" python scripts/profile_scale.py \
      --mb 64 --pairs 16000 2>&1 | tail -25 | tee -a "$LOG"
  sleep 30
}
run megaq-new     TPUBWA_SEED_MODE=megaq
run megaq-mlx2    TPUBWA_SEED_MODE=megaq TPUBWA_QB_MLX=2
run hybrid-auto   TPUBWA_SEED_MODE=hybrid
run host-ref      TPUBWA_SEED_MODE=host
echo "=== bench.py ===" | tee -a "$LOG"
timeout 1800 python bench.py 2>>"$LOG" | tee -a "$LOG"
echo done | tee -a "$LOG"
