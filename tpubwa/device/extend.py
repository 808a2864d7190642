"""Batched seed extension on device (ksw.c:ksw_extend2 semantics,
SURVEY.md §2 rows 9-10,17).

A job = one (query-slice, ref-slice, h0, w, pen) extension task; the
dispatch layer collects thousands across a read batch (the QuickAssist
batching idea) and this module runs them all in one device program.

``extend_batch`` is the XLA path: jobs vectorized across the batch
axis, target rows iterated with lax.fori_loop, the F-gap scan computed
as a prefix max (closed form, see ref/ksw.py), adaptive band trimming
and Z-drop reproduced exactly with per-job scalar state.  The Pallas
wavefront kernel (extend_pallas.py) is a drop-in replacement validated
against the same oracle.

Bit-exactness contract (tested in tests/test_device_extend.py):
(score, qle, tle, gtle, gscore, max_off) identical to ref.ksw.ksw_extend
for every job, including tie-breaking and early-exit timing.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

I32 = jnp.int32
NEG = -(1 << 29)


@partial(jax.jit, static_argnames=("o_del", "e_del", "o_ins", "e_ins",
                                   "zdrop", "qmax", "tmax"))
def extend_batch(q: jnp.ndarray, t: jnp.ndarray, qlen: jnp.ndarray,
                 tlen: jnp.ndarray, h0: jnp.ndarray, w: jnp.ndarray,
                 end_bonus: jnp.ndarray, mat: jnp.ndarray,
                 o_del: int, e_del: int, o_ins: int, e_ins: int,
                 zdrop: int, qmax: int, tmax: int):
    """Run N ksw_extend jobs in lockstep.

    q: int32 [N, qmax] query codes; t: int32 [N, tmax] target codes
    qlen/tlen/h0/w/end_bonus: int32 [N]; mat: int32 [5, 5]

    Returns (score, qle, tle, gtle, gscore, max_off): each int32 [N].
    """
    N = q.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    jidx = jnp.arange(qmax + 1, dtype=I32)[None, :]     # [1, qmax+1]
    lane = jidx[:, :qmax]                               # [1, qmax]

    # ---- first row of eh (shifted): eh_h[j] = H(-1, j-1)
    ramp = h0[:, None] - oe_ins - (jidx - 1) * e_ins
    eh_h0 = jnp.where(jidx == 0, h0[:, None],
                      jnp.maximum(ramp, 0)).astype(I32)
    # upstream stops the ramp at the first value <= e_ins; since the
    # ramp is strictly decreasing, values after the stop are exactly
    # the clamped-to-0 ones — identical arrays.
    eh_h0 = jnp.where(jidx <= qlen[:, None], eh_h0, 0)
    eh_e0 = jnp.zeros((N, qmax + 1), I32)

    # ---- band cap from end_bonus (w = min(w, max_ins, max_del))
    mmax = jnp.maximum(jnp.max(mat), 0).astype(I32)
    max_ins = ((qlen * mmax + end_bonus - o_ins) // e_ins + 1).astype(I32)
    max_del = ((qlen * mmax + end_bonus - o_del) // e_del + 1).astype(I32)
    ww = jnp.minimum(w, jnp.maximum(max_ins, 1))
    ww = jnp.minimum(ww, jnp.maximum(max_del, 1))

    # flat scoring profile: score of (target_base, query_lane)
    qpad = jnp.where(lane < qlen[:, None], q[:, :qmax], 4)

    def row(i, state):
        (eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
         max_off, dead) = state
        i32 = jnp.asarray(i, I32)
        act = (~dead) & (i32 < tlen)
        beg_i = jnp.maximum(beg, i32 - ww)
        end_i = jnp.minimum(jnp.minimum(end, i32 + ww + 1), qlen)
        closed = beg_i >= end_i
        h1_first = jnp.where(beg_i == 0,
                             jnp.maximum(h0 - (o_del + e_del * (i32 + 1)),
                                         0), 0).astype(I32)
        tb = t[jnp.arange(N), jnp.clip(i32, 0, tmax - 1)]
        prof = mat[tb[:, None], qpad]                   # [N, qmax]
        in_band = (lane >= beg_i[:, None]) & (lane < end_i[:, None])
        Hdiag = eh_h[:, :qmax]
        M = jnp.where(Hdiag != 0, Hdiag + prof, 0)
        M = jnp.where(in_band, M, NEG)
        E = jnp.where(in_band, eh_e[:, :qmax], NEG)
        he = jnp.maximum(M, E)
        # F prefix-max scan (F[beg]=0; see ref/ksw.py derivation)
        t_ins = jnp.maximum(M - oe_ins, 0)
        t_ins = jnp.where(in_band, t_ins, NEG)
        scan_in = t_ins + lane * e_ins
        pm = jax.lax.cummax(scan_in, axis=1)
        F = jnp.concatenate(
            [jnp.full((N, 1), NEG, I32), pm[:, :-1]], axis=1) \
            - lane * e_ins + e_ins
        F = jnp.where(lane == beg_i[:, None], 0, F)
        H = jnp.maximum(he, F)
        H = jnp.where(in_band, H, 0)
        act_band = act & ~closed
        m = jnp.max(jnp.where(in_band, H, NEG), axis=1)
        m = jnp.maximum(m, 0)  # H >= 0 in band; empty handled by closed
        mj = jnp.max(jnp.where(in_band & (H == m[:, None]), lane, -1),
                     axis=1)
        # E for next row
        t_del = jnp.maximum(M - oe_del, 0)
        Enew = jnp.maximum(eh_e[:, :qmax] - e_del, t_del)
        # ---- writebacks (only for active, open-band jobs)
        upd = act_band[:, None]
        # eh_h[beg] = h1_first; eh_h[j] = H[j-1] for j in (beg, end]
        Hshift = jnp.concatenate([jnp.zeros((N, 1), I32), H], axis=1)
        wmask_h = (jidx > beg_i[:, None]) & (jidx <= end_i[:, None])
        eh_h = jnp.where(upd & wmask_h, Hshift, eh_h)
        eh_h = jnp.where(upd & (jidx == beg_i[:, None]),
                         h1_first[:, None], eh_h)
        wmask_e = (jidx >= beg_i[:, None]) & (jidx < end_i[:, None])
        Epad = jnp.concatenate([Enew, jnp.zeros((N, 1), I32)], axis=1)
        eh_e = jnp.where(upd & wmask_e, Epad, eh_e)
        eh_e = jnp.where(upd & (jidx == end_i[:, None]), 0, eh_e)
        # closed-band lane: upstream writes eh[end]=h1, eh_e[end]=0,
        # takes the gscore update, then breaks on m==0
        cl = (act & closed)[:, None]
        eh_h = jnp.where(cl & (jidx == end_i[:, None]),
                         h1_first[:, None], eh_h)
        eh_e = jnp.where(cl & (jidx == end_i[:, None]), 0, eh_e)
        h_last = jnp.where(closed, h1_first,
                           Hshift[jnp.arange(N),
                                  jnp.clip(end_i, 0, qmax)])
        # gscore (ties -> later i)
        at_qend = act & (end_i == qlen) & (h_last >= gscore)
        max_ie = jnp.where(at_qend, i32, max_ie)
        gscore = jnp.where(at_qend, h_last, gscore)
        # m == 0 or closed band -> dead
        dead = dead | (act & (closed | (m == 0)))
        alive = act & ~closed & (m != 0)
        # best update (strictly greater) else zdrop check
        better = alive & (m > best)
        off = jnp.abs(mj - i32)
        max_off = jnp.where(better, jnp.maximum(max_off, off), max_off)
        best_new = jnp.where(better, m, best)
        max_i = jnp.where(better, i32, max_i)
        max_j = jnp.where(better, mj, max_j)
        if zdrop > 0:
            di = i32 - max_i
            dj = mj - max_j
            zd = jnp.where(
                di > dj,
                best - m - (di - dj) * e_del > zdrop,
                best - m - (dj - di) * e_ins > zdrop)
            dead = dead | (alive & ~better & zd)
        best = best_new
        # adaptive band trim on the UPDATED shifted arrays
        nz = (eh_h != 0) | (eh_e != 0)
        in_scan = (jidx >= beg_i[:, None]) & (jidx < end_i[:, None])
        first_nz = jnp.min(jnp.where(in_scan & nz, jidx, qmax + 2),
                           axis=1)
        beg_n = jnp.minimum(first_nz, end_i)
        in_scan2 = (jidx >= beg_n[:, None]) & (jidx <= end_i[:, None])
        last_nz = jnp.max(jnp.where(in_scan2 & nz, jidx, NEG), axis=1)
        j_dn = jnp.where(last_nz == NEG, beg_n - 1, last_nz)
        end_n = jnp.minimum(j_dn + 2, qlen)
        beg = jnp.where(alive, beg_n, beg)
        end = jnp.where(alive, end_n, end)
        return (eh_h, eh_e, beg, end, best, max_i, max_j, max_ie,
                gscore, max_off, dead)

    zeros = jnp.zeros(N, I32)
    state = (eh_h0, eh_e0, zeros, qlen.astype(I32), h0.astype(I32),
             zeros - 1, zeros - 1, zeros - 1, zeros - 1, zeros,
             jnp.zeros(N, bool))
    state = jax.lax.fori_loop(0, tmax, row, state)
    (eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
     max_off, dead) = state
    return (best, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off)


def extend_batch_np(jobs, mat, o_del, e_del, o_ins, e_ins, zdrop,
                    qmax, tmax):
    """Convenience wrapper: list of dict jobs -> numpy result tuple.
    Pads the job count to pow2 buckets so wave sizes don't retrace."""
    n_real = len(jobs)
    N = 64
    while N < n_real:
        N <<= 1
    q = np.full((N, qmax), 4, np.int32)
    t = np.full((N, tmax), 4, np.int32)
    qlen = np.zeros(N, np.int32)
    tlen = np.zeros(N, np.int32)
    h0 = np.ones(N, np.int32)
    w = np.zeros(N, np.int32)
    eb = np.zeros(N, np.int32)
    for i, j in enumerate(jobs):
        ql, tl = len(j["q"]), len(j["t"])
        q[i, :ql] = j["q"]
        t[i, :tl] = j["t"]
        qlen[i] = ql
        tlen[i] = tl
        h0[i] = j["h0"]
        w[i] = j["w"]
        eb[i] = j["end_bonus"]
    out = extend_batch(jnp.asarray(q), jnp.asarray(t),
                       jnp.asarray(qlen), jnp.asarray(tlen),
                       jnp.asarray(h0), jnp.asarray(w), jnp.asarray(eb),
                       jnp.asarray(mat, dtype=I32), o_del, e_del, o_ins,
                       e_ins, zdrop, qmax, tmax)
    return tuple(np.asarray(x)[:n_real] for x in out)
