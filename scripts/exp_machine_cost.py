#!/usr/bin/env python
"""Isolate fixed vs marginal costs of the split SMEM machines on the
real chip (the profile shows ~240 ms per bwd dispatch for ~16 rounds —
this pins down where that goes).

Times, each synced with a D2H (block_until_ready does not block on this
backend — PERF_NOTES.md):
  - a no-op jit returning buffers of the same sizes (pure link floor)
  - fwd machine, full run vs max_rounds=1 (fixed cost incl. 1 round)
  - bwd machine (trivial + nontrivial r1 jobs), full vs max_rounds=1

Usage: python scripts/exp_machine_cost.py [--mb 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t_sync(fn, reps=3):
    best = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        if isinstance(out, tuple):
            for o in out:
                np.asarray(o)
        else:
            np.asarray(out)
        best.append(time.perf_counter() - t0)
    return min(best), best


def isolated_seed(args, fmi, didx, qd_unused=None):
    """Time collect_intv_device + SA positions for a fresh 8192-read
    chunk, no extension running — isolates seeding from link/thread
    contention with the rest of the pipeline."""
    from tpubwa.opts import MemOpt
    from tpubwa.device.pipeline import DeviceAligner
    import jax.numpy as jnp
    opt = MemOpt()
    al = DeviceAligner.__new__(DeviceAligner)
    al.opt = opt
    al.fmi = fmi
    al.didx = didx
    al.put_sharded = jnp.asarray
    al.put_repl = jnp.asarray
    al.chunk_reads = 8192
    rng = np.random.default_rng(11)
    from tpubwa.io.fastq import Read
    codes = fmi.bnt.codes
    for rep in range(3):
        poss = rng.integers(0, len(codes) - 200, 8192)
        reads = []
        for p in poss:
            r = codes[p:p + 100].copy()
            mut = rng.random(100) < 0.01
            r[mut] = (r[mut] + 1) % 4
            reads.append(Read(name="x", seq=r, qual=None))
        t0 = time.perf_counter()
        intv, sapos = al._seed_chunk(reads)
        dt = time.perf_counter() - t0
        print(f"[exp] isolated _seed_chunk rep{rep}: {dt*1e3:.0f} ms "
              f"({len(intv[0])} rows)", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reads", type=int, default=8192)
    args = ap.parse_args()

    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from profile_scale import cached_index
    from tpubwa.opts import MemOpt
    from tpubwa.device.occ import DeviceIndex
    from tpubwa.device import smem_split as ss
    import jax.numpy as jnp
    import jax

    fmi = cached_index(args.mb)
    opt = MemOpt()
    print("[exp] creating DeviceIndex (H2D)...", file=sys.stderr,
          flush=True)
    didx = DeviceIndex.from_fmindex(fmi)
    print("[exp] DeviceIndex on device", file=sys.stderr, flush=True)
    rng = np.random.default_rng(7)
    B = args.reads
    L = 100
    codes = fmi.bnt.codes
    poss = rng.integers(0, len(codes) - 200, B)
    reads = np.stack([codes[p:p + L] for p in poss]).astype(np.uint8)
    mut = rng.random((B, L)) < 0.01
    reads = np.where(mut, (reads + 1) % 4, reads).astype(np.uint8)
    arr = np.full((B, 128), 4, np.uint8)
    arr[:, :L] = reads
    lens = np.full(B, L, np.int32)
    qd = jnp.asarray(arr)
    ld = jnp.asarray(lens)

    P = ss._stack_P(didx)
    MAXC, MAXM = 8, 12
    npdt = didx.np_idt

    # ---- link floor: dummy program producing the same output sizes
    @jax.jit
    def dummy(x):
        snap = jnp.zeros((B, MAXC, P, 4), didx.idt) + x[0]
        buf = jnp.zeros(B * MAXC * 2 + B + 1, np.int32) + x[0]
        return snap, buf

    xj = jnp.asarray(np.zeros(8, np.int32))
    dummy(xj)  # compile
    dt, alls = t_sync(lambda: dummy(xj)[1])
    print(f"[exp] dummy jit (fwd-sized D2H {B*MAXC*2*4/1e3:.0f}KB): "
          f"{dt*1e3:.1f} ms {['%.0f' % (a*1e3) for a in alls]}")

    jobs_np = np.zeros((B, 8), npdt)
    jobs_np[:, 0] = np.arange(B)
    jobs_np[:, 2] = 1
    jobs_h2d = lambda: jnp.asarray(jobs_np)

    # ---- fwd machine: full vs 1-round
    for mr in (2048, 1):
        ss.smem_fwd_machine(didx, qd, ld, jobs_h2d(), P, MAXC,
                            max_rounds=mr)[1].block_until_ready()
        dt, alls = t_sync(lambda: ss.smem_fwd_machine(
            didx, qd, ld, jobs_h2d(), P, MAXC, max_rounds=mr)[1])
        print(f"[exp] fwd machine max_rounds={mr}: {dt*1e3:.1f} ms "
              f"{['%.0f' % (a*1e3) for a in alls]}")

    # ---- real r1 jobs for the bwd machine
    snap, meta, ncalls, ovf = ss.run_fwd(
        didx, qd, ld, np.arange(B, dtype=np.int32),
        np.zeros(B, np.int32), np.ones(B, npdt), np.zeros(B, bool),
        P, MAXC)
    good = ~ovf
    csel = (np.arange(MAXC)[None, :] < ncalls[:, None]) & good[:, None]
    cm = csel.reshape(-1)
    lanes = np.repeat(np.arange(B, dtype=np.int32), MAXC)[cm]
    calls = np.tile(np.arange(MAXC, dtype=np.int32), B)[cm]
    jsrc = lanes * MAXC + calls
    jx = meta.reshape(-1, 2)[cm, 0].astype(np.int32)
    jm = meta.reshape(-1, 2)[cm, 1].astype(np.int32)
    prevc = reads[np.minimum(lanes, B - 1),
                  np.maximum(np.minimum(jx - 1, L - 1), 0)]
    nontriv = (jx > 0) & (prevc <= 3)
    print(f"[exp] r1 bwd jobs: {len(jsrc)} total, "
          f"{int(nontriv.sum())} nontrivial")

    for name, sel in (("trivial", ~nontriv), ("nontrivial", nontriv)):
        idx = np.flatnonzero(sel)[:8192]
        if not len(idx):
            continue
        jb = np.zeros((ss._pad_pow2(len(idx)), 8), npdt)
        jb[:len(idx), 0] = jsrc[idx]
        jb[:len(idx), 1] = lanes[idx]
        jb[:len(idx), 2] = jx[idx]
        jb[:len(idx), 3] = jm[idx]
        jb[:, 4] = 1
        if name == "nontrivial":
            order = np.argsort(-jx[idx], kind="stable")
            jb[:len(idx)] = jb[:len(idx)][order]
        for mr in (512, 1):
            ss.smem_bwd_machine(
                didx, qd, ld, snap, jnp.asarray(jb), P, MAXM,
                opt.min_seed_len, max_rounds=mr,
                CAPF=ss.CAPF).block_until_ready()
            dt, alls = t_sync(lambda: ss.smem_bwd_machine(
                didx, qd, ld, snap, jnp.asarray(jb), P, MAXM,
                opt.min_seed_len, max_rounds=mr, CAPF=ss.CAPF))
            print(f"[exp] bwd {name} ({len(idx)} lanes, pad "
                  f"{len(jb)}) max_rounds={mr}: {dt*1e3:.1f} ms "
                  f"{['%.0f' % (a*1e3) for a in alls]}")
    for st in ss.SEED_STATS:
        print(f"[exp] stat {st}")
    isolated_seed(args, fmi, didx)


if __name__ == "__main__":
    main()
