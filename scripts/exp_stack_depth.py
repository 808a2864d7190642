#!/usr/bin/env python
"""Backward-stack depth distribution (the megaq phase-B cost model).

Phase B gathers the full P-slot stack for every machine lane every
round (2*P occ gathers), but each call's stack size m is known after
phase A and can only SHRINK during the walk — so queue entries could
be bucketed into smaller-P machines.  This measures how much gather
work bucketing would save: the per-call m distribution, work-weighted
by the call's backward span bound (x+1 rounds).

Usage: python scripts/exp_stack_depth.py [--mb 64] [--reads 2048]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reads", type=int, default=2048)
    ap.add_argument("--len", type=int, default=100, dest="rlen")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from profile_scale import cached_index, simulate
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.device.smem_fused import _fwd_phase
    from tpubwa.device.smem_split import _stack_P
    from tpubwa.opts import MemOpt
    import jax.numpy as jnp

    fmi = cached_index(args.mb)
    didx = DeviceIndex.from_fmindex(fmi)
    opt = MemOpt()
    rng = np.random.default_rng(5)
    reads = simulate(fmi, args.reads // 2, args.rlen, rng)
    N = len(reads)
    arr = np.full((N, args.rlen), 4, np.uint8)
    lens = np.zeros(N, np.int32)
    for i, r in enumerate(reads):
        arr[i, :len(r.seq)] = r.seq
        lens[i] = len(r.seq)

    P = _stack_P(didx)
    MAXC = 12
    q = jnp.asarray(arr)
    ld = jnp.asarray(lens)
    out = _fwd_phase(didx, q, ld, jnp.arange(N, dtype=np.int32),
                     jnp.zeros(N, np.int32), jnp.ones(N, didx.idt),
                     jnp.zeros(N, bool), P, MAXC, 2048)
    meta = np.asarray(out["meta"])      # [N, MAXC, (x, m)]
    nc = np.asarray(out["call"])
    ovf = np.asarray(out["ovf_s"] | out["ovf_c"])
    ci = np.arange(MAXC)[None, :]
    valid = (ci < nc[:, None]) & ~ovf[:, None]
    m = meta[:, :, 1][valid].astype(np.int64)
    x = meta[:, :, 0][valid].astype(np.int64)  # call start position
    span = x + 1                                # walk-round bound
    print(f"[exp] {valid.sum()} calls from {N} reads "
          f"(P={P}, MAXC={MAXC}, ovf={int(ovf.sum())})")
    print(f"[exp] m: mean={m.mean():.2f} p50={np.percentile(m, 50):.0f} "
          f"p90={np.percentile(m, 90):.0f} p99={np.percentile(m, 99):.0f} "
          f"max={m.max()}")
    total_w = (span * P).sum()          # current: every round pays P
    for buckets in ([4, 8, P], [4, P], [8, P], [2, 4, 8, P]):
        w = 0
        for k, b in enumerate(buckets):
            lo = 0 if k == 0 else buckets[k - 1]
            sel = (m > lo) & (m <= b)
            w += (span[sel] * b).sum()
        print(f"[exp] buckets {buckets}: modeled bwd gather work "
              f"{w / total_w:.3f}x of P-only")
    # unweighted call counts per bucket
    hist = [(int((m <= 4).sum()), int(((m > 4) & (m <= 8)).sum()),
             int((m > 8).sum()))]
    print(f"[exp] calls by depth (<=4, 5-8, >8): {hist[0]}")


if __name__ == "__main__":
    main()
