#!/bin/bash
# Runs the queued chip experiments sequentially, solo, each in its own
# process with a generous timeout (never kill mid-compile: wedge risk).
cd /root/repo
run() {
  name=$1; to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" >> /tmp/battery.log
  timeout $to env "$@" python -u scripts/profile_scale.py --pairs 16000 \
      > /tmp/prof_$name.log 2>&1
  rc=$?
  grep -m1 "reads in" /tmp/prof_$name.log >> /tmp/battery.log
  if ! grep -q "reads in" /tmp/prof_$name.log; then
    echo "$name FAILED rc=$rc" >> /tmp/battery.log
    if ! grep -q "warmup" /tmp/prof_$name.log; then
      echo "ABORT: wedge pattern (no warmup print)" >> /tmp/battery.log
      exit 1
    fi
  fi
  sleep 30
}
run host     1200 TPUBWA_SEED_MODE=host
run hybrid   1200 TPUBWA_SEED_MODE=hybrid
run megaq    1200 TPUBWA_SEED_MODE=megaq
run mega     900  TPUBWA_SEED_MODE=mega
run host8k   1200 TPUBWA_SEED_MODE=host TPUBWA_CHUNK_READS=8192
run megaq16k 1200 TPUBWA_SEED_MODE=megaq TPUBWA_CHUNK_READS=16384
run megaqml2 1200 TPUBWA_SEED_MODE=megaq TPUBWA_QB_MLX=2
run megaqnsa 1200 TPUBWA_SEED_MODE=megaq TPUBWA_NO_SA_FUSE=1
run hybrid60 1200 TPUBWA_SEED_MODE=hybrid TPUBWA_HYBRID_DEV_FRAC=0.6 TPUBWA_HYBRID_AUTO=0
echo "=== gather_scale ($(date +%H:%M:%S)) ===" >> /tmp/battery.log
timeout 900 python -u scripts/exp_gather_scale.py --sizes-mb 1,8,64,256 --widths 4,12 > /tmp/exp_gather.log 2>&1
grep "\[exp\]" /tmp/exp_gather.log >> /tmp/battery.log
timeout 1800 python -u bench.py > /tmp/bench_live.json 2>/tmp/bench_live.log
tail -1 /tmp/bench_live.json >> /tmp/battery.log
echo "=== battery done ($(date +%H:%M:%S)) ===" >> /tmp/battery.log
