#!/usr/bin/env python
"""On-chip equality gate + A/B timing for DESCRIPTOR-mode extension
(the word-gather tile path, device/extend_fused.py:_ref_window /
_query_window).

Round-4 landed TPUBWA_TILE_GATHER=word default-ON with CPU-only
equality evidence — the exact failure class of the round-3 megaq
re-land (CPU interpret green, Mosaic lowering corrupted on chip).
This gate runs the REAL backend:

  equality: adversarial descriptors vs the scalar_fused oracle —
    every sub-word offset 0..15 for rbeg/qbeg, windows starting or
    ending flush at the fwd/rev pac boundary on both strands, empty
    left/right sides, N codes in the query, non-multiple-of-16 tmax,
    both the int16 and int32 result wires;
  timing (--time): ms/dispatch for word vs element tile gathers on a
    realistic-shaped wave (gather mode is a static jit arg since the
    ADVICE-r4 fix, so the A/B genuinely measures two programs).

Usage: python scripts/chip_desc_equality.py [--n 1024] [--time]
Exit 0 = bit-identical on the consumed lanes.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mk_descs(rng, lp, B, L, n):
    """Adversarial descriptors honoring the extension_plan contract
    (windows never cross l_pac; host/regions.py clips rmax) while
    hitting every alignment edge the word path cares about."""
    rows = []
    for k in range(n):
        lq = int(rng.integers(60, L + 1))
        # sweep every sub-word phase of qbeg and rbeg
        qbeg = (k % 16) if k % 3 == 0 else int(rng.integers(0, lq - 19))
        qbeg = min(qbeg, lq - 20)
        slen = int(rng.integers(19, min(40, lq - qbeg) + 1))
        if k % 5 == 0:
            slen = lq - qbeg          # no right side
        if k % 7 == 0:
            qbeg = 0                  # no left side
        side_rev = (k >> 1) % 2
        lo, hi = (lp, 2 * lp) if side_rev else (0, lp)
        rbeg = int(rng.integers(lo, hi - slen))
        rbeg = (rbeg & ~15) | (k % 16)      # force sub-word phase
        rbeg = max(lo, min(rbeg, hi - slen))
        if k % 13 == 0:
            rbeg = lo                 # window flush at boundary start
        if k % 13 == 1:
            rbeg = hi - slen          # window flush at boundary end
        tl = int(rng.integers(0, 200)) if qbeg else 0
        tr = (int(rng.integers(0, 200)) if lq - qbeg - slen else 0)
        rmax0 = max(lo, rbeg - tl)
        rmax1 = min(hi, rbeg + slen + tr)
        rows.append((int(rng.integers(0, B)), qbeg, slen, lq, rbeg,
                     rmax0, rmax1, int(rng.choice([25, 100])), slen,
                     5, 5))
    return np.asarray(rows, np.int64)


def materialize(bnt, reads, d):
    """Scalar job tuple for one descriptor row (the oracle's input)."""
    ri, qbeg, slen, lq, rbeg, rmax0, rmax1 = (int(x) for x in d[:7])
    query = reads[ri][:lq]
    qe = qbeg + slen
    qlen_r = lq - qe
    empty = query[:0]
    if qbeg:
        qs = query[:qbeg][::-1].copy()
        tlen_l = rbeg - rmax0
        ts = bnt.get_seq(rmax0, rbeg)[::-1].copy()
    else:
        qs, tlen_l, ts = empty, 0, empty
    if qlen_r:
        tlen_r = rmax1 - rbeg - slen
        tr = bnt.get_seq(rbeg + slen, rmax1)
    else:
        tlen_r, tr = 0, empty
    return (qbeg, qs, tlen_l, ts, qlen_r, query[qe:], tlen_r, tr,
            int(d[7]), int(d[8]), int(d[9]), int(d[10]))


def run_equality(fmi, didx, n, log):
    from tpubwa.device.extend_fused import (extend_seed_desc_np,
                                            scalar_fused)
    from tpubwa.opts import MemOpt
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(0xD35C)
    B, L = 32, 100
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    text = fmi.bnt.doubled()
    for i in range(0, B, 2):   # genome-echo reads: high-score paths
        s = int(rng.integers(0, len(text) - L))
        reads[i] = text[s:s + L]
    reads[1, 40] = 4           # N in a query
    reads[1, 41] = 4
    da = mk_descs(rng, fmi.bnt.l_pac, B, L, n)
    bad = 0
    got = extend_seed_desc_np(didx, np.asarray(reads), da, mat,
                              opt.o_del, opt.e_del, opt.o_ins,
                              opt.e_ins, opt.zdrop, 512,
                              interpret=False)
    for i in range(len(da)):
        job = materialize(fmi.bnt, reads, da[i])
        want = scalar_fused(job, mat, opt.o_del, opt.e_del, opt.o_ins,
                            opt.e_ins, opt.zdrop)
        ok = True
        if job[0] > 0:
            ok &= (got[i, :6].tolist() == want[:6].tolist()
                   and got[i, 12] == want[12])
        if job[4] > 0:
            ok &= (got[i, 6:12].tolist() == want[6:12].tolist()
                   and got[i, 13] == want[13])
        ok &= bool(got[i, 14] == want[14] and got[i, 15] == want[15])
        if not ok:
            bad += 1
            if bad <= 5:
                log(f"[chipdesc] MISMATCH row {i} d={da[i].tolist()}: "
                    f"got {got[i].tolist()} want {want.tolist()}")
    return bad


def run_timing(fmi, didx, log):
    """A/B ms/dispatch: word vs element tiles, realistic wave shape
    (4096 jobs, W=128, tmax=256 — the dominant realistic-corpus
    signature per docs/PERF_NOTES.md round-4 table)."""
    import jax
    import jax.numpy as jnp
    from tpubwa.device.extend_fused import extend_seed_desc
    from tpubwa.opts import MemOpt
    opt = MemOpt()
    rng = np.random.default_rng(7)
    B, L, N = 1024, 100, 4096
    reads = rng.integers(0, 4, (B, L)).astype(np.uint8)
    da = mk_descs(rng, fmi.bnt.l_pac, B, L, N)
    qd = jnp.asarray(reads)
    desc = jnp.asarray(da.astype(didx.np_idt))
    out = {}
    for mode in ("word", "element"):
        def f():
            return extend_seed_desc(
                didx, qd, desc, opt.a, opt.b, opt.o_del, opt.e_del,
                opt.o_ins, opt.e_ins, opt.zdrop, 128, 256, False,
                False, mode)
        np.asarray(f())            # compile
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f())
            ts.append((time.perf_counter() - t0) * 1e3)
        med = sorted(ts)[2]
        out[mode] = med
        log(f"[chipdesc] {mode}-gather: {med:.1f} ms / {N} jobs "
            f"(median-of-5, incl. link)")
    log(f"[chipdesc] word/element dispatch ratio: "
        f"{out['word'] / out['element']:.2f}x")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()

    def log(m):
        print(m, flush=True)

    import jax
    assert jax.default_backend() == "tpu", (
        f"need the real chip, got {jax.default_backend()}")
    import tpubwa.device  # noqa: F401  (x64)
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.index import FMIndex
    from tpubwa.sim import make_bench_bnt
    rng = np.random.default_rng(11)
    bnt = make_bench_bnt(400_000, rng, realistic=True)
    fmi = FMIndex.build(bnt)
    didx = DeviceIndex.from_fmindex(fmi)
    bad = run_equality(fmi, didx, args.n, log)
    if args.time:
        run_timing(fmi, didx, log)
    if bad:
        log(f"[chipdesc] FAILED: {bad}/{args.n} mismatches")
        sys.exit(1)
    log(f"[chipdesc] PASSED: {args.n} descriptor jobs bit-identical "
        f"on {jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
