#!/usr/bin/env python
"""Host-seeding throughput vs genome scale (the host mode's cache
question: the 64 Mb tables half-fit L3; GRCh38-scale tables are
~2.5 GB and every occ touch is a miss — how much does 39-50 us/read
degrade?).

Usage: python scripts/exp_host_seed_scale.py [--mb 64,3100] [--reads N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", default="64,3100")
    ap.add_argument("--reads", type=int, default=8192)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from profile_scale import cached_index, simulate
    from tpubwa.opts import MemOpt
    from tpubwa.host.native_smem import (sa_positions_native,
                                         smem_collect_batch_native)
    from tpubwa.ref.smem import collect_intv

    for mb in [int(x) for x in args.mb.split(",")]:
        fmi = cached_index(mb)
        opt = MemOpt()
        rng = np.random.default_rng(14)
        reads = simulate(fmi, args.reads // 2, 100, rng)
        B = len(reads)
        arr = np.full((B, 100), 4, np.uint8)
        lens = np.zeros(B, np.int32)
        for i, r in enumerate(reads):
            arr[i, :len(r.seq)] = r.seq
            lens[i] = len(r.seq)
        smem_collect_batch_native(opt, fmi, arr[:8], lens[:8])
        best = 1e18
        for _ in range(3):
            t0 = time.perf_counter()
            rows = smem_collect_batch_native(opt, fmi, arr, lens)
            best = min(best, time.perf_counter() - t0)
        print(f"[exp] {mb} Mb: seed(r1-3) {best / B * 1e6:.1f} us/read "
              f"-> {B / best:.0f} reads/s ({len(rows)} rows)",
              flush=True)
        t0 = time.perf_counter()
        sa = sa_positions_native(fmi, rows[:, :5], int(opt.max_occ))
        dt = time.perf_counter() - t0
        npos = len(sa[0]) if sa else 0
        print(f"[exp] {mb} Mb: SA walk {dt / max(npos, 1) * 1e6:.2f} "
              f"us/pos, {npos} positions, {dt:.3f}s total", flush=True)
        # correctness spot-check vs the Python oracle
        for i in rng.integers(0, B, 3):
            want = [(m.x0, m.x1, m.size, m.qb, m.qe)
                    for m in collect_intv(opt, fmi,
                                          arr[i][:lens[i]])]
            got = [tuple(int(v) for v in r[:5])
                   for r in rows[rows[:, 5] == i]]
            assert got == want, f"mismatch at {mb} Mb read {i}"
        print(f"[exp] {mb} Mb: native == oracle spot-check ok",
              flush=True)


if __name__ == "__main__":
    main()
