#!/usr/bin/env python
"""Measure backward-pass stack-depth decay in smem1a at genome scale.

The fused call machine extends ALL P=16 stack slots every backward
round (2*P occ gathers per lane per round — the dominant gather count
in phase B).  If the live depth decays quickly, a depth-staged phase B
(full P for the first K rounds, P/2 after) halves the gather bill.
This script instruments the scalar reference to print depth-vs-round
and rounds-per-call histograms on simulated reads over the cached
64 Mb index.

Usage: JAX_PLATFORMS=cpu python scripts/exp_bwd_depth.py [--reads 64]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--mb", type=int, default=64)
    args = ap.parse_args()

    from profile_scale import cached_index, simulate
    from tpubwa.ref import smem as rs
    from tpubwa.opts import MemOpt

    fmi = cached_index(args.mb)
    rng = np.random.default_rng(7)
    reads = simulate(fmi, args.reads // 2, 100, rng)
    opt = MemOpt()

    # instrument: wrap smem1a's backward loop by monkey-patching
    # bwt_extend to count, and record depth per round via a tracing
    # shim around the module-level function
    depth_by_round = {}   # round index within a call -> [depths]
    rounds_per_call = []
    m0_per_call = []

    orig = rs.smem1a

    def traced(fmi_, q, x, min_intv, max_intv, mem_out):
        # replicate the reference loop with tracing (kept in lockstep
        # with ref/smem.py:smem1a; asserts identical output)
        length = len(q)
        ref_out = []
        ret = orig(fmi_, q, x, min_intv, max_intv, ref_out)
        if q[x] > 3 or (max_intv and rs.set_intv(fmi_, int(q[x])).size <= max_intv):
            mem_out.clear()
            mem_out.extend(ref_out)
            return ret
        mi = max(min_intv, 1)
        ik = rs.set_intv(fmi_, int(q[x]))
        ik.qe = x + 1
        curr = []
        i = x + 1
        while i < length:
            if ik.size < max_intv:
                curr.append(ik)
                break
            elif q[i] < 4:
                c = 3 - int(q[i])
                ok = rs.bwt_extend(fmi_, ik, is_back=False)
                if ok[c].size != ik.size:
                    curr.append(ik)
                    if ok[c].size < mi:
                        break
                ik = ok[c]
                ik.qe = i + 1
            else:
                curr.append(ik)
                break
            i += 1
        if i == length:
            curr.append(ik)
        curr.reverse()
        m0_per_call.append(len(curr))
        prev = curr
        i = x - 1
        r = 0
        while i >= -1:
            c = -1 if i < 0 or q[i] > 3 else int(q[i])
            depth_by_round.setdefault(r, []).append(len(prev))
            nxt = []
            for p in prev:
                ok = None
                if c >= 0 and ik.size >= max_intv:
                    ok = rs.bwt_extend(fmi_, p, is_back=True)
                if c < 0 or ik.size < max_intv or ok[c].size < mi:
                    pass
                elif len(nxt) == 0 or ok[c].size != nxt[-1].size:
                    nxt.append(rs.BwtIntv(ok[c].x0, ok[c].x1,
                                          ok[c].size, qb=p.qb, qe=p.qe))
            r += 1
            if len(nxt) == 0:
                break
            prev = nxt
            i -= 1
        rounds_per_call.append(r)
        mem_out.clear()
        mem_out.extend(ref_out)
        return ret

    rs.smem1a = traced
    try:
        for rd in reads:
            rs.collect_intv(opt, fmi, rd.seq)
    finally:
        rs.smem1a = orig

    print(f"calls={len(rounds_per_call)} "
          f"m0 mean={np.mean(m0_per_call):.1f} "
          f"p50={np.percentile(m0_per_call, 50):.0f} "
          f"p95={np.percentile(m0_per_call, 95):.0f} "
          f"max={max(m0_per_call)}")
    rr = np.array(rounds_per_call)
    print(f"bwd rounds/call mean={rr.mean():.1f} "
          f"p50={np.percentile(rr, 50):.0f} "
          f"p95={np.percentile(rr, 95):.0f} max={rr.max()}")
    tot = sum(len(v) * 1.0 for v in depth_by_round.values())
    acc = 0.0
    print("round:  n-live  mean-depth  p95  max   (cumulative lane-rounds)")
    for r in sorted(depth_by_round):
        v = np.array(depth_by_round[r])
        acc += len(v)
        if r < 12 or r % 8 == 0 or len(v) < 4:
            print(f"  {r:3d}: {len(v):6d}  {v.mean():7.2f} "
                  f"{np.percentile(v, 95):5.0f} {v.max():4d}   "
                  f"({100*acc/tot:.0f}%)")
    # gather bill: sum over rounds of depth vs fixed P=16
    lane_rounds = sum(len(v) for v in depth_by_round.values())
    work = sum(int(v.sum()) for v in
               (np.array(x) for x in depth_by_round.values()))
    print(f"lane-rounds={lane_rounds} sum-depth={work} "
          f"(P=16 lockstep waste = {16*lane_rounds/max(work,1):.1f}x)")


if __name__ == "__main__":
    main()
