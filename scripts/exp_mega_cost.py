#!/usr/bin/env python
"""Decompose the mega seeding dispatch (~480-530 ms at 8192 reads,
64 Mb) into fixed + phase-A + phase-B costs by capping round counts.

  T_fix  = max_rounds_f=1, max_rounds_b=1  (link floor + H2D + D2H)
  T_A    = full fwd, max_rounds_b=1        (fix + phase A)
  T_full = full machine                    (fix + A + B)

Implied: phase-A round = (T_A - T_fix) / rf, phase-B round =
(T_full - T_A) / rb.  Uses the r1 call machine (not the chunk
machine) so the caps isolate cleanly.

Usage: python scripts/exp_mega_cost.py [--mb 64] [--reads 8192]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reads", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    from profile_scale import cached_index, simulate
    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.device import smem_fused as sf
    from tpubwa.device.smem_split import _stack_P
    from tpubwa.opts import MemOpt
    import jax.numpy as jnp

    fmi = cached_index(args.mb)
    didx = DeviceIndex.from_fmindex(fmi)
    opt = MemOpt()
    rng = np.random.default_rng(11)
    reads = simulate(fmi, args.reads // 2, 100, rng)
    B = len(reads)
    arr = np.full((B, 128), 4, np.uint8)
    for i, r in enumerate(reads):
        arr[i, :r.l_seq] = r.seq
    qd = jnp.asarray(arr)
    ld = jnp.asarray(np.full(B, 100, np.int32))
    P = _stack_P(didx)
    npdt = didx.np_idt
    jobs = np.zeros((B, 8), npdt)
    jobs[:, 0] = np.arange(B)
    jobs[:, 2] = 1
    jd = jnp.asarray(jobs)

    def run(mf, mb):
        return sf.smem_call_machine(didx, qd, ld, jd, P, 8, 24, 5,
                                    opt.min_seed_len, max_rounds_f=mf,
                                    max_rounds_b=mb)

    def t_sync(fn):
        ts = []
        rounds = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            buf = np.asarray(fn())
            ts.append(time.perf_counter() - t0)
            rounds = (int(buf[-2]), int(buf[-1]))
        return min(ts), rounds

    # warm compiles (3 variants)
    for mf, mb in ((1, 1), (2048, 1), (2048, 1024)):
        np.asarray(run(mf, mb))
        time.sleep(1)

    t_fix, r_fix = t_sync(lambda: run(1, 1))
    t_a, r_a = t_sync(lambda: run(2048, 1))
    t_full, r_full = t_sync(lambda: run(2048, 1024))
    rf, rb = r_full
    print(f"[exp] T_fix  = {t_fix*1e3:7.1f} ms  rounds={r_fix}")
    print(f"[exp] T_A    = {t_a*1e3:7.1f} ms  rounds={r_a}")
    print(f"[exp] T_full = {t_full*1e3:7.1f} ms  rounds={r_full}")
    if rf and rb:
        print(f"[exp] phase-A round ~ {(t_a - t_fix)/rf*1e3:.2f} ms; "
              f"phase-B round ~ {(t_full - t_a)/rb*1e3:.2f} ms "
              f"({args.reads} lanes, P={P})")


if __name__ == "__main__":
    main()
