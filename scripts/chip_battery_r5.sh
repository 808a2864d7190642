#!/bin/bash
# Round-5 chip battery: the validated sequence a fresh session should
# run FIRST on the real chip.  Encodes the round-5 operational rules
# (docs/PERF_NOTES.md §Round-5; memory: axon-chip-operations):
#   - NEVER timeout-kill a chip process: a killed grant degrades the
#     next process's first op from ~40 s to 100-400+ s.
#   - the chip's throughput is bimodal between processes (±25%,
#     occasional 5x collapse); interleave any A/B inside ONE process.
#   - build/refresh the 3.1 Gbp index cache BEFORE any chip work
#     (the SA-IS build monopolizes the one host core for ~65 min and
#     starves the tunnel).
set -e
cd "$(dirname "$0")/.."

echo "== 0. cache check (GRCh38-scale index: ~65 min to build cold)"
if [ ! -f ~/.cache/tpubwa-bench/idx3100mr.tpubwa.shm/meta.json ]; then
    echo "   cache ABSENT -> building now (do NOT run chip work in parallel)"
    python -c "
import sys; sys.path.insert(0, '.')
from tpubwa.sim import bench_index
fmi = bench_index(3100, realistic=True, log=print)
import os
p = os.path.expanduser('~/.cache/tpubwa-bench/idx3100mr')
if not os.path.exists(p + '.tpubwa.shm/meta.json'):
    fmi.save_shm(p)
"
else
    echo "   cache present"
fi

echo "== 1. chip health probe"
python -c "
import time; t0 = time.time()
import jax, jax.numpy as jnp
print('first op', float(jnp.ones(8).sum()), f'{time.time()-t0:.1f}s',
      '(>120 s => a killed grant is draining; wait, do not kill)')"

echo "== 2. equality gates (run before ANY kernel/seeding commit)"
python scripts/chip_extend_equality.py --n 1500
python scripts/chip_desc_equality.py --n 1024
python scripts/chip_megaq_equality.py 2>/dev/null || \
    echo "   (megaq gate script exited nonzero or absent — check)"

echo "== 3. perf reference points (good-state values; ±25% drift)"
python scripts/exp_kernel_floor.py --reps 16   # full/mxu ~1.3-1.9 ms
echo "== 4. bench rows (reference: 64mbr ~3.8-4.4k, grch38r ~1.7-1.9k)"
python bench.py
echo "== battery done"
