#!/usr/bin/env python
"""Attribute the megaq machine's realistic-corpus deficit (VERDICT r4
Weak #1 / round-5 brief item 3).

Round 4 measured the device seeding share at ~890 reads/s on the
repeat-realistic chip profile vs ~15k native on ONE host core and
responded by degrading to host; this experiment splits that deficit
with the same rigor round 4 applied to extension.  Per chunk it
reports:

  dispatch_s     host-side packing + H2D + dispatch (async) cost
  machine_s      decode sync wait == machine execution + D2H
                 (SEED_STATS sync_s)
  host_mirror_s  _r2_jobs_from + decode numpy work
  tail_s         native host redo of overflow lanes (count + time)
  rounds_f/b     queue-machine round counts
  ovf1/ovf2      overflow lanes (stack/emission/rounds) per section

Sweeps (--sweep): TPUBWA_RB_CAP in {64,128,256,1024} — the round-cap
lever trades machine rounds for host-tail jobs; lane-count (reads per
machine) for fixed-cost amortization; plus a 64-read dispatch to pin
the fixed floor.  Native baseline timed on the same chunk.

Usage (on chip): python scripts/exp_megaq_realistic.py
                 [--reads 2048] [--sweep] [--uniform]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pack(reads, L=101):
    B = len(reads)
    arr = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        lens[i] = len(r.seq)
        arr[i, :len(r.seq)] = r.seq
    return arr, lens


def run_once(opt, didx, arr, lens, fmi, label, log):
    """One timed megaq run with phase attribution."""
    import tpubwa.device.smem_fused as sf
    from tpubwa.device.smem import collect_intv_device
    from tpubwa.device.smem_split import SEED_STATS
    tail = {"jobs": 0, "s": 0.0, "calls": 0}
    orig = sf._scalar_full

    def timed_scalar_full(*a, **k):
        t0 = time.perf_counter()
        r = orig(*a, **k)
        tail["s"] += time.perf_counter() - t0
        tail["jobs"] += len(a[6])
        tail["calls"] += 1
        return r

    sf._scalar_full = timed_scalar_full
    n0 = len(SEED_STATS)
    try:
        t0 = time.perf_counter()
        out = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                                  mode="megaq", return_flat=True,
                                  return_sa=True)
        wall = time.perf_counter() - t0
    finally:
        sf._scalar_full = orig
    stats = SEED_STATS[n0:]
    sync_s = sum(s[8] for s in stats if len(s) > 8)
    rf = sum(s[6] for s in stats)
    rb = sum(s[7] for s in stats)
    ovf1 = sum(s[4] for s in stats)
    ovf2 = sum(s[5] for s in stats)
    n_disp = len(stats)
    rate = len(arr) / wall
    log(f"[megaq] {label}: {len(arr)} reads in {wall:.3f}s "
        f"({rate:.0f} reads/s) | sync(machine) {sync_s:.3f}s, "
        f"tail {tail['s']:.3f}s/{tail['jobs']} jobs/"
        f"{tail['calls']} calls, other {wall - sync_s - tail['s']:.3f}s"
        f" | rounds f={rf} b={rb}, ovf1={ovf1} ovf2={ovf2}, "
        f"dispatches={n_disp}, rows={len(out[0])}")
    return dict(wall=wall, rate=rate, sync=sync_s, tail=tail["s"],
                tail_jobs=tail["jobs"], rf=rf, rb=rb, ovf1=ovf1,
                ovf2=ovf2, rows=len(out[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep-qb", action="store_true")
    ap.add_argument("--sweep-p", action="store_true")
    ap.add_argument("--uniform", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    def log(m):
        print(m, flush=True)

    import jax
    log(f"[megaq] backend {jax.default_backend()}")
    import tpubwa.device  # noqa: F401
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.host.native_smem import smem_collect_batch_native
    from tpubwa.opts import MemOpt
    from tpubwa.sim import bench_index, simulate_pe
    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    fmi = bench_index(args.mb, realistic=not args.uniform, log=log)
    didx = DeviceIndex.from_fmindex(fmi)
    opt = MemOpt()
    rng = np.random.default_rng(5)
    reads = simulate_pe(fmi.bnt, args.reads // 2, 100, rng)
    arr, lens = pack(reads)

    # native baseline on the same chunk
    t0 = time.perf_counter()
    rows6 = smem_collect_batch_native(opt, fmi, arr, lens)
    t_nat = time.perf_counter() - t0
    log(f"[megaq] native baseline: {len(arr)} reads in {t_nat:.3f}s "
        f"({len(arr) / t_nat:.0f} reads/s), {len(rows6)} rows")

    # warm (compile) then measure
    run_once(opt, didx, arr, lens, fmi, "warmup(compile)", log)
    for rep in range(args.reps):
        run_once(opt, didx, arr, lens, fmi, f"rep{rep}", log)

    # fixed-cost floor: 64-read dispatch (same compiled shapes? no —
    # 64-lane machine is its own shape; this measures the link+decode
    # floor of ONE dispatch at minimal lanes)
    small, slens = arr[:64], lens[:64]
    run_once(opt, didx, small, slens, fmi, "64-read warm", log)
    run_once(opt, didx, small, slens, fmi, "64-read floor", log)

    if args.sweep:
        for cap in (64, 128, 256, 512):
            os.environ["TPUBWA_RB_CAP"] = str(cap)
            run_once(opt, didx, arr, lens, fmi,
                     f"RB_CAP={cap} warmup", log)
            r = run_once(opt, didx, arr, lens, fmi,
                         f"RB_CAP={cap}", log)
        os.environ.pop("TPUBWA_RB_CAP", None)
    if args.sweep_p:
        for p in (8,):
            os.environ["TPUBWA_STACK_P"] = str(p)
            run_once(opt, didx, arr, lens, fmi,
                     f"P={p} warmup", log)
            run_once(opt, didx, arr, lens, fmi, f"P={p}", log)
            run_once(opt, didx, arr, lens, fmi, f"P={p} rep1", log)
        os.environ.pop("TPUBWA_STACK_P", None)
    if args.sweep_qb:
        for qb in (256, 512, 1024):
            os.environ["TPUBWA_QB_BUDGET"] = str(qb)
            run_once(opt, didx, arr, lens, fmi,
                     f"QB={qb} warmup", log)
            run_once(opt, didx, arr, lens, fmi, f"QB={qb}", log)
        os.environ.pop("TPUBWA_QB_BUDGET", None)


if __name__ == "__main__":
    main()
