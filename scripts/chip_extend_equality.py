#!/usr/bin/env python
"""On-chip equality gate for the Pallas extension kernel (the test
class round 3 was missing: the CPU-forced suite runs the kernel in
interpret mode, so Mosaic lowering bugs — MXU precision, relayouts,
roll semantics — are invisible to it).

Fuzzes extend_batch_pallas on the REAL backend against the ref.ksw
scalar oracle across lane widths (128/256/512), degenerate shapes
(qlen 1, tlen 1, tiny bands, huge h0) and adversarial score ranges.
Run before any kernel-change commit; exit 0 = identical.

Usage: python scripts/chip_extend_equality.py [--n 1500]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1500)
    args = ap.parse_args()
    import jax
    assert jax.default_backend() == "tpu", (
        f"need the real chip, got {jax.default_backend()}")
    from tpubwa.device.extend_pallas import extend_batch_pallas_np
    from tpubwa.opts import MemOpt
    from tpubwa.ref.ksw import ksw_extend

    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(0xC41F)
    jobs = []
    for i in range(args.n):
        bucket = i % 4
        if bucket == 0:       # typical 100bp read halves
            ql = int(rng.integers(1, 101))
            tl = int(rng.integers(1, 220))
        elif bucket == 1:     # degenerate
            ql = int(rng.integers(1, 4))
            tl = int(rng.integers(1, 4))
        elif bucket == 2:     # long reads -> 256/512-lane widths
            ql = int(rng.integers(120, 500))
            tl = int(rng.integers(100, 900))
        else:                 # N-rich
            ql = int(rng.integers(5, 80))
            tl = int(rng.integers(5, 160))
        q = rng.integers(0, 5 if bucket == 3 else 4, ql).astype(np.uint8)
        # correlated target so extensions actually extend
        t = np.concatenate([q, q, q])[:tl].copy() if tl <= 3 * ql \
            else np.concatenate(
                [q] * (tl // max(ql, 1) + 1))[:tl].copy()
        mut = rng.random(tl) < rng.choice([0.02, 0.1, 0.4])
        t[mut] = rng.integers(0, 4, int(mut.sum()))
        w = int(rng.choice([1, 5, 25, 100, 200]))
        h0 = int(rng.choice([1, 19, ql, max(1, ql - 5)]))
        eb = int(rng.choice([0, 5, 17]))
        jobs.append(dict(q=q.astype(np.int32), t=t.astype(np.int32),
                         w=w, end_bonus=eb, h0=h0))
    qmax = max(len(j["q"]) for j in jobs)
    tmax = 1024
    res = extend_batch_pallas_np(jobs, mat, opt.o_del, opt.e_del,
                                 opt.o_ins, opt.e_ins, opt.zdrop,
                                 qmax, tmax, interpret=False)
    bad = 0
    for i, j in enumerate(jobs):
        r = ksw_extend(len(j["q"]), j["q"], len(j["t"]), j["t"], mat,
                       opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                       j["w"], j["end_bonus"], opt.zdrop, j["h0"])
        got = tuple(int(res[k][i]) for k in range(6))
        want = (r.score, r.qle, r.tle, r.gtle, r.gscore, r.max_off)
        if got != want:
            bad += 1
            if bad <= 5:
                print(f"[chipext] MISMATCH job {i} "
                      f"(ql={len(j['q'])} tl={len(j['t'])} w={j['w']} "
                      f"h0={j['h0']} eb={j['end_bonus']}): "
                      f"got {got} want {want}")
    if bad:
        print(f"[chipext] FAILED: {bad}/{args.n} mismatches")
        sys.exit(1)
    print(f"[chipext] PASSED: {args.n} jobs bit-identical on "
          f"{jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
