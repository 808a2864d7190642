#!/usr/bin/env python
"""Price the per-round primitives of the megaq seeding machine on the
real chip: XLA scatter (.at[].set) vs one-hot MXU matmul compaction +
dynamic_update_slice vs plain gathers.

Round-2 PERF_NOTES: occ gathers explain only ~10-25% of a megaq round;
the in-loop dynamic scatters/compaction are suspected to dominate
(mega, with where-writes only, beat megaq on chip despite 2.9x more
rounds).  This measures each primitive in isolation, chained K reps
inside one jitted program behind a data dependency (per-dispatch link
cost ~7-40 ms would otherwise swamp the measurement).

Usage: python scripts/exp_scatter_price.py [--ml 8192] [--reps 64]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ml", type=int, default=8192)
    ap.add_argument("--cap", type=int, default=65536)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=512)
    ap.add_argument("--platform", default="auto")
    args = ap.parse_args()
    if args.platform != "auto":
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    ML, CAP, B, K = args.ml, args.cap, args.b, args.reps
    rng = np.random.default_rng(0)
    row6 = jnp.asarray(rng.integers(0, 1 << 30, (ML, 6)), jnp.int32)
    can = jnp.asarray(rng.random(ML) < 0.05)          # ~5% emit/round
    out0 = jnp.zeros((CAP + B, 6), jnp.int32)
    gsrc = jnp.asarray(rng.integers(0, CAP, ML), jnp.int32)
    big = jnp.asarray(rng.integers(0, 1 << 30, (CAP, 4)), jnp.int32)

    def scatter_round(out, out_n, dep):
        r6 = row6.at[0, 0].set(dep)                   # data dep
        erank = jnp.cumsum(can.astype(jnp.int32)) - 1
        gpos = out_n + erank
        ok = can & (gpos < CAP)
        out = out.at[jnp.where(ok, gpos, CAP)].set(r6, mode="drop")
        out_n = out_n + jnp.sum(ok, dtype=jnp.int32)
        return out, out_n

    def matmul_round(out, out_n, dep):
        r6 = row6.at[0, 0].set(dep)
        erank = jnp.cumsum(can.astype(jnp.int32)) - 1
        ok = can & (erank < B)
        onehot = (ok[:, None]
                  & (erank[:, None]
                     == jnp.arange(B, dtype=jnp.int32)[None, :]))
        oh = onehot.astype(jnp.float32)
        lo = (r6 & 0xFFFF).astype(jnp.float32)
        hi = (r6 >> 16).astype(jnp.float32)
        halves = jnp.concatenate([lo, hi], axis=1)     # [ML, 12]
        comp = jnp.dot(oh.T, halves,
                       preferred_element_type=jnp.float32)
        ci = comp.astype(jnp.int32)
        rows = (ci[:, 6:] << 16) | ci[:, :6]
        out = jax.lax.dynamic_update_slice(
            out, rows, (out_n, jnp.zeros((), jnp.int32)))
        out_n = out_n + jnp.sum(ok, dtype=jnp.int32)
        return out, out_n

    def gather_round(out, out_n, dep):
        idx = (gsrc + dep) % CAP
        g = big[idx]                                   # [ML, 4] gather
        out_n = out_n + g[0, 0] % 2
        out = out.at[0, 0].add(jnp.sum(g[:, 0]))
        return out, out_n

    def chain(fn, k):
        @jax.jit
        def run(out):
            def body(i, c):
                o, n = c
                return fn(o, n % CAP, i)
            return jax.lax.fori_loop(
                0, k, body, (out, jnp.zeros((), jnp.int32)))
        return run

    print(f"[price] backend={jax.default_backend()} ML={ML} CAP={CAP} "
          f"B={B} reps={K}", file=sys.stderr)
    for name, fn in (("scatter", scatter_round),
                     ("matmul-compact", matmul_round),
                     ("gather[ML,4]", gather_round)):
        r1 = chain(fn, 1)
        rk = chain(fn, K)
        np.asarray(r1(out0)[0])       # compile + warm
        np.asarray(rk(out0)[0])
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(r1(out0)[0])
            t1 = time.perf_counter()
            np.asarray(rk(out0)[0])
            t2 = time.perf_counter()
            best.append(((t2 - t1) - (t1 - t0)) / (K - 1))
        per = min(best)
        print(f"[price] {name:16s}: {per * 1e6:9.1f} us/round "
              f"(3 tries: {[round(b * 1e6, 1) for b in best]})",
              flush=True)


if __name__ == "__main__":
    main()
