#!/usr/bin/env python
"""Attribute the extend-desc wall on the REAL job stream (round-4
VERDICT item: 7.9 s for 552k jobs on the 64 Mb realistic corpus while
the pure kernel is ~2.1 s — where do the other ~5 s go?).

Captures the actual descriptor waves the native planner emits on the
realistic corpus (by wrapping extend_seed_desc_np), then replays each
wave on the chip in variants:

  h2d        jnp.asarray(desc) + block            (wire up)
  tiles      gathers qL/tL/qR/tR -> sums          (tile materialization)
  resident   extend_seed_desc on resident desc    (gathers + 4 passes)
  full       extend_seed_desc_np                  (+ H2D + D2H + pack)

kernel ~= resident - tiles;  d2h+pack ~= full - resident - h2d.

Usage: python scripts/exp_desc_breakdown.py [--mb 64] [--pairs 4096]
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
    ap.add_argument("--pairs", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    import functools

    import jax
    import jax.numpy as jnp

    from tpubwa.device.pipeline import make_device_aligner
    from tpubwa.host.pipeline import process_seqs
    from tpubwa.opts import MEM_F_PE, MemOpt
    from tpubwa.sim import bench_index, simulate_pe

    fmi = bench_index(args.mb, realistic=True,
                      log=lambda m: print(m, file=sys.stderr))
    opt = MemOpt(flag=MEM_F_PE)
    rng = np.random.default_rng(1)
    aligner = make_device_aligner(opt, fmi)

    # ---- capture the real waves
    import tpubwa.device.extend_fused as ef
    captured = []
    orig = ef.extend_seed_desc_np

    def capture(didx, qd, jobs, *a, **k):
        if isinstance(jobs, np.ndarray):
            captured.append((qd, np.array(jobs)))
        return orig(didx, qd, jobs, *a, **k)

    ef.extend_seed_desc_np = capture
    reads = simulate_pe(fmi.bnt, args.pairs, 100, rng)
    t0 = time.time()
    process_seqs(opt, fmi, reads, 0, align_fn=aligner)
    print(f"[exp] pipeline pass {time.time()-t0:.1f}s, captured "
          f"{len(captured)} waves, "
          f"{sum(len(d) for _, d in captured)} jobs", file=sys.stderr)
    ef.extend_seed_desc_np = orig

    didx = aligner.didx
    from tpubwa.device.extend_fused import (_extend_seed_desc_impl,
                                            _ref_codes,
                                            extend_seed_desc,
                                            extend_seed_desc_np)
    from tpubwa.device.extend_pallas import _mat_ab, chunk_for, width_for
    mat = opt.scoring_matrix()
    ab = _mat_ab(mat)

    @functools.partial(jax.jit, static_argnames=("W", "tmax"))
    def tiles_only(didx, qreads, desc, W, tmax):
        I32 = jnp.int32
        read = desc[:, 0].astype(I32)
        qbeg = desc[:, 1].astype(I32)
        slen = desc[:, 2].astype(I32)
        lq = desc[:, 3].astype(I32)
        rbeg, rmax0, rmax1 = desc[:, 4], desc[:, 5], desc[:, 6]
        qe = qbeg + slen
        qlenL = qbeg
        qlenR = lq - qe
        tlenL = jnp.where(qlenL > 0, (rbeg - rmax0).astype(I32), 0)
        tlenR = jnp.where(qlenR > 0, (rmax1 - rbeg).astype(I32) - slen,
                          0)
        L = qreads.shape[1]
        jW = jnp.arange(W, dtype=I32)[None, :]
        qL = jnp.where(jW < qlenL[:, None],
                       qreads[read[:, None],
                              jnp.clip(qbeg[:, None] - 1 - jW, 0,
                                       L - 1)].astype(I32), 4)
        qR = jnp.where(jW < qlenR[:, None],
                       qreads[read[:, None],
                              jnp.clip(qe[:, None] + jW, 0,
                                       L - 1)].astype(I32), 4)
        jT = jnp.arange(tmax, dtype=desc.dtype)[None, :]
        tL = jnp.where(jT < tlenL[:, None],
                       _ref_codes(didx, rbeg[:, None] - 1 - jT), 4)
        tR = jnp.where(jT < tlenR[:, None],
                       _ref_codes(didx, (rbeg + slen)[:, None] + jT), 4)
        return (qL.sum(), qR.sum(), tL.sum(dtype=jnp.int64),
                tR.sum(dtype=jnp.int64))

    @functools.partial(jax.jit, static_argnames=("W", "tmax"))
    def nod2h(didx, qreads, desc, W, tmax):
        # full compute, result reduced on device: excludes result wire
        return _extend_seed_desc_impl(
            didx, qreads, desc, ab[0], ab[1], opt.o_del, opt.e_del,
            opt.o_ins, opt.e_ins, opt.zdrop, W, tmax, False).sum()

    for wi, (qd, da) in enumerate(captured):
        n = len(da)
        # replicate extend_seed_desc_np's padding/bucketing
        tlL = np.where(da[:n, 1] > 0, da[:n, 4] - da[:n, 5], 0)
        tlR = np.where(da[:n, 3] - da[:n, 1] - da[:n, 2] > 0,
                       da[:n, 6] - da[:n, 4] - da[:n, 2], 0)
        order = sorted(range(n),
                       key=lambda i: -(int(tlL[i]) + int(tlR[i])))
        W = width_for(int(max(da[:n, 1].max(initial=0),
                              (da[:n, 3] - da[:n, 1] - da[:n, 2])
                              .max(initial=0))))
        CH = chunk_for(W)
        from tpubwa.device.extend_pallas import JOBS
        if n <= JOBS:
            N = JOBS
        else:
            K = 1
            while K * CH < n:
                K <<= 1
            N = K * CH
        tm = 128
        while tm < max(int(tlL.max(initial=0)), int(tlR.max(initial=0))):
            tm <<= 1
        tm = min(tm, 1024)
        desc = np.zeros((N, 11), didx.np_idt)
        desc[:, 8] = 1
        desc[:, 7] = 1
        for slot, i in enumerate(order):
            desc[slot] = da[i]
        dbytes = desc.nbytes / 1e6
        rbytes = N * 16 * 4 / 1e6

        def t(f, reps=args.reps):
            f()   # warm/compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                f()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        dd = jnp.asarray(desc)
        dd.block_until_ready()
        t_h2d = t(lambda: jnp.asarray(desc).block_until_ready())
        t_tiles = t(lambda: jax.block_until_ready(
            tiles_only(didx, qd, dd, W, tm)))
        t_nod2h = t(lambda: jax.block_until_ready(
            nod2h(didx, qd, dd, W, tm)))
        t_res = t(lambda: np.asarray(extend_seed_desc(
            didx, qd, dd, ab[0], ab[1], opt.o_del, opt.e_del,
            opt.o_ins, opt.e_ins, opt.zdrop, W, tm, False)))
        t_full = t(lambda: extend_seed_desc_np(
            didx, qd, da, mat, opt.o_del, opt.e_del, opt.o_ins,
            opt.e_ins, opt.zdrop, 1024))
        print(f"[exp] wave {wi}: n={n} N={N} W={W} tm={tm} "
              f"desc={dbytes:.1f}MB res={rbytes:.1f}MB", file=sys.stderr)
        print(f"[exp]   h2d={t_h2d*1e3:7.1f}ms tiles={t_tiles*1e3:7.1f}ms "
              f"nod2h={t_nod2h*1e3:7.1f}ms resident={t_res*1e3:7.1f}ms "
              f"full={t_full*1e3:7.1f}ms", file=sys.stderr)
        print(f"[exp]   => gathers~{t_tiles*1e3:.0f}ms "
              f"passes~{(t_nod2h-t_tiles)*1e3:.0f}ms "
              f"result-d2h~{(t_res-t_nod2h)*1e3:.0f}ms "
              f"h2d+pack~{(t_full-t_res)*1e3:.0f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
