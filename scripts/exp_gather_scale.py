#!/usr/bin/env python
"""Occ-gather issue rate vs table size (the genome-scale falloff
suspect: VERDICT r1 'occ-gather locality at large seq_len').

Measures raw occ_blocks-row gather throughput at several table sizes
(1 Mb-scale fits on-chip caches; 64 Mb+ is HBM random access), with
reps chained behind a data dependency so dispatch rate is excluded
(the round-1 GCUPS lesson, docs/PERF_NOTES.md).

Usage: python scripts/exp_gather_scale.py [--lanes 262144] [--reps 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--sizes-mb", default="1,8,64,256")
    ap.add_argument("--widths", default="12",
                    help="comma-separated row widths (u32 words)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for smoke)")
    args = ap.parse_args()

    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from functools import partial

    print(f"[exp] devices: {jax.devices()}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("reps",))
    def chained_gather(table, idx, reps):
        # each rep's indices depend on the previous gather's data so
        # XLA cannot overlap reps; per-rep cost = one gather round
        def body(i, carry):
            acc, ix = carry
            rows = table[ix]
            s = jnp.sum(rows, axis=-1, dtype=jnp.uint32)
            ix = (ix ^ s) % table.shape[0]
            return acc + s[0], ix
        acc, ix = jax.lax.fori_loop(0, reps, body,
                                    (jnp.uint32(0), idx))
        return acc + ix[0]

    rng = np.random.default_rng(0)
    widths = [int(w) for w in args.widths.split(",")]
    for mb in (int(s) for s in args.sizes_mb.split(",")):
      for width in widths:
        # table modeled on occ_blocks: one 12-word row per 128 bases,
        # doubled text -> 2 * mb * 1e6 / 128 rows; width sweep tells
        # issue-rate-bound (width-flat) from bandwidth/latency-bound
        rows = max(2 * mb * 1_000_000 // 128, 1024)
        table = jnp.asarray(
            rng.integers(0, 2**32, (rows, width), dtype=np.uint32))
        idx = jnp.asarray(
            rng.integers(0, rows, args.lanes, dtype=np.int32))
        # block_until_ready does not block on the axon backend
        # (docs/PERF_NOTES.md) -- force sync with a D2H of the scalar.
        # Warm BOTH programs (reps is static -> two distinct XLA
        # programs) so the timed windows exclude compilation.
        np.asarray(chained_gather(table, idx, 2))
        np.asarray(chained_gather(table, idx, args.reps + 2))
        # timed: reps+2 vs 2 to cancel fixed costs
        t0 = time.perf_counter()
        np.asarray(chained_gather(table, idx, 2))
        t1 = time.perf_counter()
        np.asarray(chained_gather(table, idx, args.reps + 2))
        t2 = time.perf_counter()
        per_round = ((t2 - t1) - (t1 - t0)) / args.reps
        ns = per_round / args.lanes * 1e9
        print(f"[exp] {mb:4d} Mb w={width:2d} ({rows} rows, "
              f"{rows * width * 4 / 1e6:.0f} MB): "
              f"{per_round * 1e3:.2f} ms / "
              f"{args.lanes} gathers = {ns:.2f} ns/idx",
              file=sys.stderr)


if __name__ == "__main__":
    main()
