#!/usr/bin/env python
"""Locate the extension kernel's time (VERDICT round-2 weak #3).

Measured ~3.3 GCUPS vs a ~28 GCUPS 35-op/cell VPU ceiling: the gap is
NOT explained by op count (even 90 ops/cell would bound at ~11-16
GCUPS), so something per-ROW dominates: the while_loop carry, the
[1,J]->[J,1] transpose of the target row, the 9 lane-rolls (7 in the
F prefix scan), the 5 cross-lane reductions, or the band-trim block.

This script times TIMING-ONLY variants of the kernel (semantics
deliberately broken) to attribute the per-row cost: each variant
removes one component.  Chained reps inside one jit (link excluded).

Usage: python scripts/exp_kernel_breakdown.py [--jobs 512] [--reps 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_kernel(variant, tmax):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    I32 = jnp.int32
    NEG = -(1 << 29)

    def _c(v):
        return jnp.asarray(v, I32)

    def _roll1(x, sh):
        return pltpu.roll(x, shift=jnp.asarray(sh, I32), axis=1)

    def _prefix_max(x):
        n = x.shape[-1]
        sh = 1
        cols = jax.lax.broadcasted_iota(I32, x.shape, 1)
        while sh < n:
            shifted = _roll1(x, sh)
            x = jnp.maximum(x, jnp.where(cols >= _c(sh), shifted,
                                         _c(NEG)))
            sh <<= 1
        return x

    a, b, o_del, e_del, o_ins, e_ins, zdrop = 1, 4, 6, 1, 6, 1, 100

    def kernel(q_ref, t_ref, p_ref, out_ref):
        J = q_ref.shape[0]
        NL = q_ref.shape[1]
        oe_del = o_del + e_del
        oe_ins = o_ins + e_ins
        lane = jax.lax.broadcasted_iota(I32, (J, NL), 1)
        qlen = p_ref[:, 0:1]
        tlen = p_ref[:, 1:2]
        h0 = p_ref[:, 2:3]
        w_in = p_ref[:, 3:4]
        q = q_ref[:, :]
        qpad = jnp.where(lane < qlen, q, _c(4))
        ww = w_in
        ramp = h0 - oe_ins - (lane - 1) * e_ins
        eh_h = jnp.where(lane == _c(0), jnp.broadcast_to(h0, (J, NL)),
                         jnp.maximum(ramp, _c(0)))
        eh_e = jnp.zeros((J, NL), I32)
        zero1 = jnp.zeros((J, 1), I32)
        tile_tmax = jnp.minimum(jnp.max(tlen), t_ref.shape[0])

        def cond(c):
            (i, eh_h, eh_e, beg, end, best, dead) = c
            return (i < tile_tmax) & (jnp.min(dead) == _c(0))

        def body(c, strip=None):
            (i, eh_h, eh_e, beg, end, best, dead) = c
            act = (dead == _c(0)) & (i < tlen)
            beg_i = jnp.maximum(beg, i - ww)
            end_i = jnp.minimum(jnp.minimum(end, i + ww + 1), qlen)
            if variant == "no-transpose":
                tb = jnp.broadcast_to(_c(1), (J, 1))
            elif variant == "tdot":
                # transpose-free: t arrives job-major [J, tmax]; row
                # i's column comes from an MXU matvec against a
                # one-hot (exact: codes 0..4 in f32/bf16, one nonzero
                # addend).  tf32 is hoisted above the loop.
                tf32, tmx = strip
                oh = (jax.lax.broadcasted_iota(I32, (tmx, 1), 0)
                      == i).astype(jnp.float32)
                tb = jnp.dot(tf32, oh,
                             preferred_element_type=jnp.float32
                             ).astype(I32)
            elif variant == "t8-slice":
                # fix candidate (strip mode): the outer loop advances
                # 8 rows per iteration and hands each sub-row its
                # column of a [J, 8] strip (one slice+transpose per 8
                # rows); here `i` is the row and the strip arrives
                # via closure (see body8 below)
                sel = jax.lax.broadcasted_iota(I32, (J, 8), 1) \
                    == (i & _c(7))
                tb = jnp.sum(jnp.where(sel, strip, _c(0)), axis=1,
                             keepdims=True)
            else:
                ii = jnp.clip(i, _c(0), _c(t_ref.shape[0] - 1))
                tb = t_ref[pl.ds(ii, 1), :].reshape(1, J).T
            isn = (tb > 3) | (qpad > 3)
            prof = jnp.where(isn, _c(-1),
                             jnp.where(tb == qpad, _c(a), _c(-b)))
            in_band = (lane >= beg_i) & (lane < end_i)
            M = jnp.where(eh_h != _c(0), eh_h + prof, _c(0))
            M = jnp.where(in_band, M, _c(NEG))
            E = jnp.where(in_band, eh_e, _c(NEG))
            he = jnp.maximum(M, E)
            if variant == "no-scan":
                F = he - 1
            else:
                t_ins = jnp.where(in_band,
                                  jnp.maximum(M - oe_ins, _c(0)),
                                  _c(NEG))
                pm = _prefix_max(t_ins + lane * e_ins)
                pm1 = _roll1(pm, 1)
                F = jnp.where(lane >= _c(1), pm1 - (lane - 1) * e_ins,
                              _c(NEG))
            H = jnp.maximum(he, F)
            H = jnp.where(in_band, jnp.maximum(H, _c(0)), _c(0))
            if variant == "no-reduce":
                m = H[:, 0:1]
            else:
                m = jnp.max(jnp.where(in_band, H, _c(NEG)), axis=1,
                            keepdims=True)
            Enew = jnp.maximum(eh_e - e_del,
                               jnp.maximum(M - oe_del, _c(0)))
            if variant == "no-roll":
                Hroll = H
            else:
                Hroll = _roll1(H, 1)
            eh_h = jnp.where(act, Hroll, eh_h)
            eh_e = jnp.where(act, Enew, eh_e)
            if variant == "no-trim":
                beg_n, end_n = beg, end
            else:
                nz = (eh_h != _c(0)) | (eh_e != _c(0))
                in_sc = (lane >= beg_i) & (lane < end_i)
                first_nz = jnp.min(jnp.where(in_sc & nz, lane,
                                             _c(NL + 2)),
                                   axis=1, keepdims=True)
                beg_n = jnp.minimum(first_nz, end_i)
                last_nz = jnp.max(jnp.where(in_sc & nz, lane, _c(NEG)),
                                  axis=1, keepdims=True)
                end_n = jnp.minimum(last_nz + 2, qlen)
            best = jnp.maximum(best, m)
            dead = jnp.maximum(dead, (act & (m == _c(0))).astype(I32))
            return (i + 1, eh_h, eh_e, beg_n, end_n, best, dead)

        init = (jnp.zeros((), I32), eh_h, eh_e, zero1, qlen + 0,
                h0 + 0, zero1)
        if variant == "unroll2":
            def body2(c):
                return body(body(c))
            state = jax.lax.while_loop(cond, body2, init)
        elif variant == "t8-slice":
            def body8(c):
                i = c[0]
                ii = jnp.clip(i, _c(0), _c(t_ref.shape[0] - 8))
                strip = t_ref[pl.ds(ii, 8), :].reshape(8, J).T
                for _ in range(8):
                    c = body(c, strip)
                return c
            state = jax.lax.while_loop(cond, body8, init)
        elif variant == "tdot":
            tf32 = t_ref[:, :].astype(jnp.float32)   # [J, tmax] once
            tmx = t_ref.shape[1]

            def bodyd(c):
                return body(c, (tf32, tmx))
            state = jax.lax.while_loop(cond, bodyd, init)
        else:
            state = jax.lax.while_loop(cond, body, init)
        (_, eh_h, eh_e, beg, end, best, dead) = state
        res = jnp.concatenate(
            [best, beg, end, dead, jnp.zeros((J, 128 - 4), I32)],
            axis=1)
        out_ref[:, :] = res

    def launch(q, t, p):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q.shape[0], 128), I32),
        )(q, t if variant == "tdot" else t.T, p)
    return launch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    N, QL, TL, TMAX = args.jobs, 100, 200, 256
    rng = np.random.default_rng(0)
    tpl = rng.integers(0, 4, TL + N).astype(np.int32)
    q = np.full((N, 128), 4, np.int32)
    t = np.full((N, TMAX), 4, np.int32)
    p = np.zeros((N, 128), np.int32)
    for i in range(N):
        t[i, :TL] = tpl[i:i + TL]
        q[i, :QL] = tpl[i:i + QL]
        p[i, :5] = (QL, TL, 60, 100, 5)
    qj, tj, pj = (jnp.asarray(x) for x in (q, t, p))
    K = args.reps
    base = None
    for variant in ("baseline", "no-transpose", "t8-slice", "tdot",
                    "no-scan", "no-roll", "no-reduce", "no-trim",
                    "unroll2"):
        launch = build_kernel(variant, TMAX)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(qj, tj, pj, k, _launch=launch):
            out = None
            for _ in range(k):
                out = _launch(qj, tj, pj)
                pj = pj.at[:, 6].set(out[:, 127])
            return out

        try:
            np.asarray(chain(qj, tj, pj, 1))
            np.asarray(chain(qj, tj, pj, K))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(chain(qj, tj, pj, 1))
                t1 = time.perf_counter()
                np.asarray(chain(qj, tj, pj, K))
                t2 = time.perf_counter()
                best = min(best, ((t2 - t1) - (t1 - t0)) / (K - 1))
            gc = N * QL * TL / best / 1e9
            note = ""
            if variant == "baseline":
                base = best
            elif base:
                note = f"  delta vs base: {(base - best) * 1e3:+.2f} ms"
            print(f"[kern] {variant:13s}: {best * 1e3:7.2f} ms/launch "
                  f"({gc:6.1f} GCUPS-equiv){note}", flush=True)
        except Exception as e:
            print(f"[kern] {variant:13s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
