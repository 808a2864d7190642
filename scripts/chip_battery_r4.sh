#!/bin/bash
# Round-4 chip battery — run SOLO (one chip grant per process, ~30 s
# release between runs; NEVER kill a run mid-compile).
# Reference points (round 3, solo): realistic 1,336-1,538 reads/s,
# uniform ~10k, megaq 4,584 / mega 5,415 / host 9,069 / hybrid 11,118
# (round-2 uniform numbers), kernel 3.2-3.5 GCUPS.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/battery_r4.log}
: > "$LOG"
run() {
  name=$1; shift
  echo "=== $name ===" | tee -a "$LOG"
  timeout 2400 env "$@" 2>&1 | tail -45 | tee -a "$LOG"
  sleep 30
}
# 1. kernel attribution (VERDICT #4): price transpose/scan/reduce/trim
run kernel-breakdown python scripts/exp_kernel_breakdown.py
# 2. realistic corpus, new default (SIMD ksw + adaptive overlap)
run realistic-default python scripts/profile_scale.py \
    --mb 64 --pairs 16000 --realistic
# 3. realistic, overlap forced OFF (isolates the overlap win)
run realistic-serial env TPUBWA_BATCH_OVERLAP=0 \
    python scripts/profile_scale.py --mb 64 --pairs 16000 --realistic
# 4. uniform reference (no regression check)
run uniform-default python scripts/profile_scale.py --mb 64 --pairs 16000
# 5. scatter-free megaq vs mega (VERDICT #2 perf gate)
run megaq-new env TPUBWA_SEED_MODE=megaq \
    python scripts/profile_scale.py --mb 64 --pairs 16000
run mega-ref env TPUBWA_SEED_MODE=mega \
    python scripts/profile_scale.py --mb 64 --pairs 16000
echo "=== bench.py ===" | tee -a "$LOG"
timeout 3600 env TPUBWA_BENCH_BUDGET=3000 python bench.py \
    2>>"$LOG" | tee -a "$LOG"
echo done | tee -a "$LOG"
