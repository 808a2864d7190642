#!/usr/bin/env python
"""Attribute the REAL extension kernel's per-row cost (round-4 brief
item 4, follow-up to exp_kernel_breakdown.py).

exp_kernel_breakdown's reduced kernel measured ~24 GCUPS-equiv on
chip while the real kernel benches at ~3.5 — so the 28->3.5 gap
lives in what the reduced kernel REMOVED (extra cross-lane
reductions, the 12-tuple carry, zdrop/gscore bookkeeping), not in the
scan/transpose the round-3 hypotheses blamed.  This harness copies
the REAL kernel body and strips ONE feature per variant
(timing-only; semantics deliberately broken) to attribute that gap.

Measurement fix vs the old harness: differencing (K2-K1 reps) with
K2-K1 large and min-of-5 trials — the old 1-vs-8 differencing was
swamped by the ~25-40 ms link jitter (negative deltas in the round-4
battery log).

Usage: python scripts/exp_kernel_real.py [--jobs 512] [--k1 4]
       [--k2 36] [--trials 5]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

I32 = None
NEG = -(1 << 29)


def build_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    I32 = jnp.int32

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
    has = lambda f: variant != ("no-" + f)
    rollred = variant.startswith("rollred")
    fused_mj = variant.startswith("rollred-fused")
    unroll = 1
    if variant.endswith("-u2"):
        unroll = 2
    elif variant.endswith("-u4"):
        unroll = 4

    def _tree(x, op):
        # cyclic log-roll tree: every lane ends with the full-row
        # reduction; read lane 0 (static lane slices are fine)
        n = x.shape[-1]
        sh = 1
        while sh < n:
            x = op(x, _roll1(x, sh))
            sh <<= 1
        return x[:, 0:1]

    def red_max(x):
        return _tree(x, jnp.maximum) if rollred \
            else jnp.max(x, axis=1, keepdims=True)

    def red_min(x):
        return _tree(x, jnp.minimum) if rollred \
            else jnp.min(x, axis=1, keepdims=True)

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
        ebon = p_ref[:, 4:5]
        q = q_ref[:, :]
        qpad = jnp.where(lane < qlen, q, _c(4))
        max_ins = jnp.maximum((qlen * a + ebon - o_ins) // _c(e_ins) + 1,
                              _c(1))
        max_del = jnp.maximum((qlen * a + ebon - o_del) // _c(e_del) + 1,
                              _c(1))
        ww = jnp.minimum(jnp.minimum(w_in, max_ins), max_del)
        ramp = h0 - oe_ins - (lane - 1) * e_ins
        eh_h = jnp.where(lane == _c(0), jnp.broadcast_to(h0, (J, NL)),
                         jnp.maximum(ramp, _c(0)))
        eh_h = jnp.where(lane <= qlen, eh_h, _c(0))
        eh_e = jnp.zeros((J, NL), I32)
        zero1 = jnp.zeros((J, 1), I32)
        tile_tmax = jnp.minimum(jnp.max(tlen), t_ref.shape[0])

        def cond(c):
            return (c[0] < tile_tmax) & (jnp.min(c[-1]) == _c(0))

        def body(c):
            (i, eh_h, eh_e, beg, end, best, max_i, max_j, max_ie,
             gscore, max_off, dead) = c
            act = (dead == _c(0)) & (i < tlen)
            beg_i = jnp.maximum(beg, i - ww)
            end_i = jnp.minimum(jnp.minimum(end, i + ww + 1), qlen)
            closed = beg_i >= end_i
            h1_first = jnp.where(
                beg_i == _c(0),
                jnp.maximum(h0 - (o_del + e_del * (i + 1)), _c(0)),
                _c(0))
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
            if has("scan"):
                t_ins = jnp.where(in_band, jnp.maximum(M - oe_ins, _c(0)),
                                  _c(NEG))
                pm = _prefix_max(t_ins + lane * e_ins)
                pm1 = _roll1(pm, 1)
                F = jnp.where(lane >= _c(1), pm1 - (lane - 1) * e_ins,
                              _c(NEG))
                F = jnp.where(lane == beg_i, _c(0), F)
            else:
                F = he - 1
            H = jnp.maximum(he, F)
            H = jnp.where(in_band, jnp.maximum(H, _c(0)), _c(0))
            if fused_mj:
                # one packed reduction: max over H*NL+lane gives the
                # row max AND its last-wins argmax (upstream ties take
                # the later j)
                sh_nl = NL.bit_length() - 1
                P = jnp.where(in_band, H * _c(NL) + lane, _c(NEG))
                Pm = red_max(P)
                m = jnp.maximum(
                    jax.lax.shift_right_arithmetic(Pm, _c(sh_nl)),
                    _c(0))
                mj = Pm & _c(NL - 1)
            else:
                m = red_max(jnp.where(in_band, H, _c(NEG)))
                m = jnp.maximum(m, _c(0))
                if has("mj"):
                    mj = red_max(jnp.where(in_band & (H == m), lane,
                                           _c(-1)))
                else:
                    mj = m * 0
            t_del = jnp.maximum(M - oe_del, _c(0))
            Enew = jnp.maximum(eh_e - e_del, t_del)
            upd = act & jnp.logical_not(closed)
            Hroll = _roll1(H, 1)
            if has("wbmask"):
                wm_h = (lane > beg_i) & (lane <= end_i)
                eh_h = jnp.where(upd & wm_h, Hroll, eh_h)
                eh_h = jnp.where(upd & (lane == beg_i), h1_first, eh_h)
                eh_e = jnp.where(upd & in_band, Enew, eh_e)
                eh_e = jnp.where(upd & (lane == end_i), _c(0), eh_e)
                cl = act & closed
                eh_h = jnp.where(cl & (lane == end_i), h1_first, eh_h)
                eh_e = jnp.where(cl & (lane == end_i), _c(0), eh_e)
            else:
                eh_h = jnp.where(upd, Hroll, eh_h)
                eh_e = jnp.where(upd, Enew, eh_e)
            if has("gscore"):
                # exactly one lane is nonzero and H >= 0, so a max
                # reduction equals the sum
                h_open = red_max(jnp.where(lane == end_i - _c(1), H,
                                           _c(0)))
                h_last = jnp.where(closed, h1_first, h_open).astype(I32)
                at_qend = act & (end_i == qlen) & (h_last >= gscore)
                max_ie = jnp.where(at_qend, i, max_ie)
                gscore = jnp.where(at_qend, h_last, gscore)
            dead = jnp.maximum(dead,
                               (act & (closed | (m == _c(0)))).astype(I32))
            alive = act & jnp.logical_not(closed) & (m != _c(0))
            better = alive & (m > best)
            if has("offtrack"):
                off = jnp.abs(mj - i)
                max_off = jnp.where(better, jnp.maximum(max_off, off),
                                    max_off)
            max_i_n = jnp.where(better, i, max_i)
            max_j_n = jnp.where(better, mj, max_j)
            if has("zdrop"):
                di = i - max_i
                dj = mj - max_j
                dd = jnp.where(di > dj, (di - dj) * e_del,
                               (dj - di) * e_ins)
                zd = (best - m - dd) > _c(zdrop)
                dead = jnp.maximum(
                    dead,
                    (alive & jnp.logical_not(better) & zd).astype(I32))
            best = jnp.where(better, m, best)
            max_i, max_j = max_i_n, max_j_n
            if has("trim"):
                nz = (eh_h != _c(0)) | (eh_e != _c(0))
                in_sc = (lane >= beg_i) & (lane < end_i)
                first_nz = red_min(jnp.where(in_sc & nz, lane,
                                             _c(NL + 2)))
                beg_n = jnp.minimum(first_nz, end_i)
                if rollred:
                    # lanes in [beg_i, beg_n) are all zero (that is how
                    # beg_n was found), so scanning [beg_i, end_i]
                    # instead of [beg_n, end_i] finds the same last
                    # nonzero — and the two reductions lose their
                    # sequential dependency
                    in_s2 = in_sc | (lane == end_i)
                else:
                    in_s2 = (lane >= beg_n) & (lane <= end_i)
                last_nz = red_max(jnp.where(in_s2 & nz, lane, _c(NEG)))
                j_dn = jnp.where(last_nz == _c(NEG), beg_n - _c(1),
                                 last_nz)
                end_n = jnp.minimum(j_dn + 2, qlen)
                beg = jnp.where(alive, beg_n, beg)
                end = jnp.where(alive, end_n, end)
            return (i + 1, eh_h, eh_e, beg, end, best, max_i, max_j,
                    max_ie, gscore, max_off, dead)

        init = (jnp.zeros((), I32), eh_h, eh_e, zero1, qlen + 0,
                h0 + 0, zero1 - 1, zero1 - 1, zero1 - 1, zero1 - 1,
                zero1, zero1)
        if unroll > 1:
            # amortize cond's cross-sublane min(dead): extra body rows
            # after all-dead (or past tile_tmax) are act-masked no-ops
            def bodyk(c):
                for _ in range(unroll):
                    c = body(c)
                return c
            state = jax.lax.while_loop(cond, bodyk, init)
        else:
            state = jax.lax.while_loop(cond, body, init)
        (_, eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
         max_off, dead) = state
        res = jnp.concatenate(
            [best, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off,
             jnp.zeros((J, 128 - 6), I32)], axis=1)
        out_ref[:, :] = res

    def launch(q, t, p):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((q.shape[0], 128), I32),
        )(q, t.T, p)
    return launch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=512)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=36)
    ap.add_argument("--trials", type=int, default=5)
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
    K1, K2 = args.k1, args.k2

    def time_launch(launch):
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(qj, tj, pj, k):
            out = None
            for _ in range(k):
                out = launch(qj, tj, pj)
                pj = pj.at[:, 6].set(out[:, 127])
            return out

        np.asarray(chain(qj, tj, pj, K1))
        np.asarray(chain(qj, tj, pj, K2))
        best = 1e9
        for _ in range(args.trials):
            t0 = time.perf_counter()
            np.asarray(chain(qj, tj, pj, K1))
            t1 = time.perf_counter()
            np.asarray(chain(qj, tj, pj, K2))
            t2 = time.perf_counter()
            best = min(best, ((t2 - t1) - (t1 - t0)) / (K2 - K1))
        return best

    # cross-check: the production kernel through its public API
    from tpubwa.device.extend_pallas import extend_batch_pallas

    def real_launch(qj, tj, pj):
        return extend_batch_pallas(qj, tj, pj, 1, 4, 6, 1, 6, 1, 100,
                                   TMAX, False)

    variants = ("full", "rollred-fused", "rollred-fused-u2",
                "rollred-fused-u4")
    base = None
    ref_out = np.asarray(real_launch(qj, tj, pj))[:, :6]
    bt = time_launch(real_launch)
    print(f"[kern] {'real-import':12s}: {bt * 1e3:7.2f} ms/launch "
          f"({N * QL * TL / bt / 1e9:6.1f} GCUPS-equiv)", flush=True)
    for variant in variants:
        try:
            launch = build_kernel(variant)
            out = np.asarray(launch(qj, tj, pj))[:, :6]
            eq = "==" if np.array_equal(out, ref_out) else "DIFFERS"
            bt = time_launch(launch)
            gc = N * QL * TL / bt / 1e9
            note = f"  out {eq} real"
            if variant == "full":
                base = bt
            elif base:
                note += f"  saves {(base - bt) * 1e3:+.2f} ms"
            print(f"[kern] {variant:12s}: {bt * 1e3:7.2f} ms/launch "
                  f"({gc:6.1f} GCUPS-equiv){note}", flush=True)
        except Exception as e:
            print(f"[kern] {variant:12s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
