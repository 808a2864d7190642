#!/usr/bin/env python
"""On-chip megaq equality drive: SAM bytes of TPUBWA_SEED_MODE=megaq
(and hybrid) must equal the host-native seeding mode on the realistic
bench corpus.  The CPU suite pins this equality per-mode already; this
drive exists because round-3's scatter-free megaq landing passed every
CPU test and then corrupted on the REAL chip (matmul precision) — any
device-semantics drift must be caught here before a default flips.

Run solo: python scripts/chip_megaq_equality.py [--pairs 1024]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run_mode(mode, fmi, pairs):
    os.environ["TPUBWA_SEED_MODE"] = mode
    from tpubwa.opts import MEM_F_PE, MemOpt
    from tpubwa.host.pipeline import process_seqs
    from tpubwa.device.pipeline import make_device_aligner
    opt = MemOpt(flag=MEM_F_PE)
    from tpubwa.sim import simulate_pe
    rng = np.random.default_rng(11)
    reads = simulate_pe(fmi.bnt, pairs, 100, rng)
    aligner = make_device_aligner(opt, fmi, platform="auto")
    return process_seqs(opt, fmi, reads, 0, align_fn=aligner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=1024)
    args = ap.parse_args()
    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    from tpubwa.sim import bench_index
    fmi = bench_index(64, realistic=True,
                      log=lambda m: print(m, file=sys.stderr))
    ref = None
    for mode in ("host", "megaq", "hybrid"):
        lines = run_mode(mode, fmi, args.pairs)
        print(f"[eq] {mode}: {len(lines)} records", file=sys.stderr)
        if ref is None:
            ref = lines
        elif lines != ref:
            diff = [i for i, (a, b) in enumerate(zip(ref, lines))
                    if a != b][:5]
            print(f"[eq] {mode} MISMATCH vs host at lines {diff}; "
                  f"lens {len(ref)} vs {len(lines)}", file=sys.stderr)
            for i in diff[:2]:
                print(f"  host : {ref[i]!r}", file=sys.stderr)
                print(f"  {mode}: {lines[i]!r}", file=sys.stderr)
            sys.exit(1)
    print(f"[eq] PASS: host == megaq == hybrid "
          f"({len(ref)} SAM records, {args.pairs} PE pairs, "
          f"64 Mb realistic corpus, backend on-chip)")


if __name__ == "__main__":
    main()
