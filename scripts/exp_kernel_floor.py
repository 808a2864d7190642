#!/usr/bin/env python
"""Term-by-term floor measurement for the extension kernel (VERDICT
r4 Weak #3 / round-5 brief item 5).

ROOFLINE §3b asserts the 1.9 ms residual decomposes into an
element-wise DP floor (~0.65 ms claimed), the F-gap prefix scan, and
four roll-tree reductions — asserted, not measured.  This measures it:

  full/split      the production kernel (4 separate roll trees)
  full/stacked    bit-identical variant: the 4 trees fused into ONE
                  roll tree over [4J, NL] (extend_pallas._reduce4)
  -scan           prefix scan ablated (timing-only, wrong output)
  -trees          all 4 reductions ablated (timing-only)
  -scan-trees     element-wise floor (what's left: DP arithmetic,
                  masks, write-backs, Hroll, loop carry)

All variants run the bench's dense 512x(100x200) perfect-match shape
(every job survives all 200 rows in every variant, so round counts
are identical and the deltas attribute cleanly).  Timing uses the
chained-reps trick from bench.kernel_gcups so the tunneled link is
excluded.

Usage (on chip): python scripts/exp_kernel_floor.py [--reps 16]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def time_variant(label, trees, ablate, reps, log):
    import jax
    import jax.numpy as jnp
    from tpubwa.device.extend_pallas import extend_batch_pallas
    rng = np.random.default_rng(0)
    N, QL, TL, TMAX = 512, 100, 200, 256
    tpl = rng.integers(0, 4, TL + N).astype(np.int32)
    q = np.full((N, 128), 4, np.int32)
    t = np.full((N, TMAX), 4, np.int32)
    p = np.zeros((N, 128), np.int32)
    for i in range(N):
        t[i, :TL] = tpl[i:i + TL]
        q[i, :QL] = tpl[i:i + QL]     # perfect match: nothing dies
        p[i, :5] = (QL, TL, 60, 100, 5)
    interp = jax.default_backend() not in ("tpu",)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(qj, tj, pj, k):
        out = None
        for _ in range(k):
            out = extend_batch_pallas(qj, tj, pj, 1, 4, 6, 1, 6, 1,
                                      100, TMAX, interp, trees,
                                      ablate)
            pj = pj.at[:, 6].set(out[:, 127])
        return out

    qj, tj, pj = (jnp.asarray(x) for x in (q, t, p))
    np.asarray(chain(qj, tj, pj, 1))
    np.asarray(chain(qj, tj, pj, reps))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(qj, tj, pj, 1))
        t1 = time.perf_counter()
        np.asarray(chain(qj, tj, pj, reps))
        t2 = time.perf_counter()
        dt = max(((t2 - t1) - (t1 - t0)) / (reps - 1), 1e-9)
        best = dt if best is None else min(best, dt)
    gcups = N * QL * TL / best / 1e9
    log(f"[floor] {label:16s}: {best * 1e3:.3f} ms/launch "
        f"({gcups:.1f} GCUPS)")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    def log(m):
        print(m, flush=True)

    import jax
    log(f"[floor] backend {jax.default_backend()}")
    import tpubwa.device  # noqa: F401
    from tpubwa.utils import enable_compilation_cache
    enable_compilation_cache()
    t_full = time_variant("full/split", "split", (), args.reps, log)
    t_stk = time_variant("full/stacked", "stacked", (), args.reps, log)
    t_ns = time_variant("-scan", "split", ("scan",), args.reps, log)
    t_nt = time_variant("-trees", "split", ("trees",), args.reps, log)
    t_ew = time_variant("-scan-trees (floor)", "split",
                        ("scan", "trees"), args.reps, log)
    log("")
    # t_full = scan_delta + trees_delta + floor + unattributed
    scan_d, trees_d = t_full - t_ns, t_full - t_nt
    unattr = t_full - scan_d - trees_d - t_ew
    log(f"[floor] attribution of {t_full * 1e3:.3f} ms: "
        f"prefix scan {scan_d * 1e3:.3f} ms, "
        f"4 trees {trees_d * 1e3:.3f} ms, "
        f"element-wise floor {t_ew * 1e3:.3f} ms, "
        f"unattributed {unattr * 1e3:+.3f} ms")
    log(f"[floor] stacked-tree capture: {t_full * 1e3:.3f} -> "
        f"{t_stk * 1e3:.3f} ms ({t_full / t_stk:.2f}x)")


if __name__ == "__main__":
    main()
