#!/usr/bin/env python
"""Decompose descriptor-mode extension wave cost on the real chip.

Per VERDICT-round-2 profiling, extension is ~1.5 s / 32k reads across
10 waves (~145 ms/wave) while the DP cells themselves are ~10 ms of
kernel math — the rest is fixed: link sync floor, H2D desc, D2H
results, tile gathers, and per-kernel launch overhead (the program
scans N/CHUNK kernel chunks).  This script measures one wave at
varying job counts and CHUNK sizes to find which fixed cost dominates.

Usage: python scripts/exp_ext_cost.py [--mb 64]
(TPUBWA_EXT_CHUNK sweeps the kernel chunk size.)
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
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    from profile_scale import cached_index
    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.device.extend_fused import extend_seed_desc_np
    from tpubwa.opts import MemOpt
    import jax.numpy as jnp

    fmi = cached_index(args.mb)
    didx = DeviceIndex.from_fmindex(fmi)
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(3)

    B, L = 8192, 128
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    qd = jnp.asarray(reads)

    def mkdesc(n):
        # realistic 100bp seed-extension jobs: seed in the middle,
        # flanks ~20-60 bp each side, target window flank + band
        d = np.zeros((n, 11), didx.np_idt)
        qbeg = rng.integers(5, 60, n)
        slen = rng.integers(19, 40, n)
        lq = np.full(n, 100)
        rbeg = rng.integers(1000, fmi.bnt.l_pac - 1000, n)
        d[:, 0] = rng.integers(0, B, n)
        d[:, 1] = qbeg
        d[:, 2] = slen
        d[:, 3] = lq
        d[:, 4] = rbeg
        d[:, 5] = rbeg - (qbeg + 40)          # rmax0
        d[:, 6] = rbeg + slen + 80            # rmax1
        d[:, 7] = opt.w
        d[:, 8] = slen  # h0
        d[:, 9] = opt.pen_clip5
        d[:, 10] = opt.pen_clip3
        return d

    for n in (512, 1024, 2048, 4096, 8192):
        desc = mkdesc(n)
        # warm compile
        extend_seed_desc_np(didx, qd, desc, mat, opt.o_del, opt.e_del,
                            opt.o_ins, opt.e_ins, opt.zdrop, 512)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = extend_seed_desc_np(didx, qd, desc, mat, opt.o_del,
                                      opt.e_del, opt.o_ins, opt.e_ins,
                                      opt.zdrop, 512)
            ts.append(time.perf_counter() - t0)
        print(f"n={n:5d} chunk={os.environ.get('TPUBWA_EXT_CHUNK','512')} "
              f"wave={min(ts)*1e3:7.1f}ms  "
              f"({min(ts)/n*1e6:.1f} us/job)", flush=True)


if __name__ == "__main__":
    main()
