"""Pallas TPU kernel for batched banded-SW seed extension
(SURVEY.md §2 rows 10,17 — the "quickassist systolic array" of this
framework, as a VPU wavefront kernel).

Layout: jobs are tiled JOBS-per-grid-step; the DP state (the shifted
eh arrays of ksw_extend) lives in VMEM as [JOBS, LANES] int32 — one
query cell per lane, one job per sublane row.  Each target row is one
vector step: the F-gap running max becomes a log2(LANES) shift-max
prefix scan, band masks are lane predicates, and per-job scalars
(band limits, best score, Z-drop state) ride as [JOBS, 1] columns.
The row loop early-exits when every job in the tile is dead, and jobs
are pre-sorted by target length so tiles stay dense.

Semantics are bit-identical to ref.ksw.ksw_extend / device.extend
(fuzzed in tests/test_extend_pallas.py).  The scoring matrix is
bwa_fill_scmat-structured (match=a, mismatch=-b, N=-1), computed
arithmetically instead of a 5x5 gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
NEG = -(1 << 29)
LANES = 256          # eh lanes -> qlen <= LANES - 1
JOBS = 64            # jobs per grid step (sublanes)


def _prefix_max(x):
    """Inclusive prefix max along lanes (log-shift scan)."""
    n = x.shape[-1]
    sh = 1
    cols = jax.lax.broadcasted_iota(I32, x.shape, 1)
    while sh < n:
        shifted = pltpu.roll(x, shift=sh, axis=1)
        x = jnp.maximum(x, jnp.where(cols >= sh, shifted, NEG))
        sh <<= 1
    return x


def _extend_kernel(q_ref, t_ref, p_ref, out_ref, *, a, b, o_del, e_del,
                   o_ins, e_ins, zdrop, tmax):
    J = q_ref.shape[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    lane = jax.lax.broadcasted_iota(I32, (J, LANES), 1)
    qlen = p_ref[:, 0:1]
    tlen = p_ref[:, 1:2]
    h0 = p_ref[:, 2:3]
    w_in = p_ref[:, 3:4]
    ebon = p_ref[:, 4:5]

    q = q_ref[:, :]
    qpad = jnp.where(lane < qlen, q, 4)
    # band cap (w = min(w, max_ins, max_del); mat max = a)
    max_ins = jnp.maximum((qlen * a + ebon - o_ins) // e_ins + 1, 1)
    max_del = jnp.maximum((qlen * a + ebon - o_del) // e_del + 1, 1)
    ww = jnp.minimum(jnp.minimum(w_in, max_ins), max_del)

    # first row of the shifted eh arrays: eh_h[j] = H(-1, j-1)
    ramp = h0 - oe_ins - (lane - 1) * e_ins
    eh_h = jnp.where(lane == 0, jnp.broadcast_to(h0, (J, LANES)),
                     jnp.maximum(ramp, 0))
    eh_h = jnp.where(lane <= qlen, eh_h, 0)
    eh_e = jnp.zeros((J, LANES), I32)

    zero1 = jnp.zeros((J, 1), I32)
    tile_tmax = jnp.minimum(jnp.max(tlen), tmax)

    def cond(c):
        (i, eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
         max_off, dead) = c
        return (i < tile_tmax) & jnp.logical_not(jnp.all(dead))

    def body(c):
        (i, eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
         max_off, dead) = c
        act = jnp.logical_not(dead) & (i < tlen)          # [J,1]
        beg_i = jnp.maximum(beg, i - ww)
        end_i = jnp.minimum(jnp.minimum(end, i + ww + 1), qlen)
        closed = beg_i >= end_i
        h1_first = jnp.where(
            beg_i == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0),
            0)
        tb = t_ref[:, pl.ds(i, 1)]                         # [J,1] wrong: i traced
        # score profile: match=a, mismatch=-b, N(either side)=-1
        isn = (tb > 3) | (qpad > 3)
        prof = jnp.where(isn, -1, jnp.where(tb == qpad, a, -b))
        in_band = (lane >= beg_i) & (lane < end_i)
        Hdiag = eh_h
        M = jnp.where(Hdiag != 0, Hdiag + prof, 0)
        M = jnp.where(in_band, M, NEG)
        E = jnp.where(in_band, eh_e, NEG)
        he = jnp.maximum(M, E)
        t_ins = jnp.where(in_band, jnp.maximum(M - oe_ins, 0), NEG)
        pm = _prefix_max(t_ins + lane * e_ins)
        pm1 = pltpu.roll(pm, shift=1, axis=1)
        F = jnp.where(lane >= 1, pm1 - (lane - 1) * e_ins, NEG)
        F = jnp.where(lane == beg_i, 0, F)
        H = jnp.maximum(he, F)
        H = jnp.where(in_band, jnp.maximum(H, 0), 0)
        m = jnp.max(jnp.where(in_band, H, NEG), axis=1, keepdims=True)
        m = jnp.maximum(m, 0)
        mj = jnp.max(jnp.where(in_band & (H == m), lane, -1), axis=1,
                     keepdims=True)
        t_del = jnp.maximum(M - oe_del, 0)
        Enew = jnp.maximum(eh_e - e_del, t_del)
        # write-backs
        upd = act & jnp.logical_not(closed)
        Hroll = pltpu.roll(H, shift=1, axis=1)
        wm_h = (lane > beg_i) & (lane <= end_i)
        eh_h = jnp.where(upd & wm_h, Hroll, eh_h)
        eh_h = jnp.where(upd & (lane == beg_i), h1_first, eh_h)
        eh_e = jnp.where(upd & in_band, Enew, eh_e)
        eh_e = jnp.where(upd & (lane == end_i), 0, eh_e)
        cl = act & closed
        eh_h = jnp.where(cl & (lane == end_i), h1_first, eh_h)
        eh_e = jnp.where(cl & (lane == end_i), 0, eh_e)
        h_open = jnp.sum(jnp.where(lane == end_i - 1, H, 0), axis=1,
                         keepdims=True)
        h_last = jnp.where(closed, h1_first, h_open)
        at_qend = act & (end_i == qlen) & (h_last >= gscore)
        max_ie = jnp.where(at_qend, i, max_ie)
        gscore = jnp.where(at_qend, h_last, gscore)
        dead = dead | (act & (closed | (m == 0)))
        alive = act & jnp.logical_not(closed) & (m != 0)
        better = alive & (m > best)
        off = jnp.abs(mj - i)
        max_off = jnp.where(better, jnp.maximum(max_off, off), max_off)
        max_i_n = jnp.where(better, i, max_i)
        max_j_n = jnp.where(better, mj, max_j)
        if zdrop > 0:
            di = i - max_i
            dj = mj - max_j
            zd = jnp.where(di > dj,
                           best - m - (di - dj) * e_del > zdrop,
                           best - m - (dj - di) * e_ins > zdrop)
            dead = dead | (alive & jnp.logical_not(better) & zd)
        best = jnp.where(better, m, best)
        max_i, max_j = max_i_n, max_j_n
        # adaptive band trim on the updated arrays
        nz = (eh_h != 0) | (eh_e != 0)
        in_sc = (lane >= beg_i) & (lane < end_i)
        first_nz = jnp.min(jnp.where(in_sc & nz, lane, LANES + 2),
                           axis=1, keepdims=True)
        beg_n = jnp.minimum(first_nz, end_i)
        in_s2 = (lane >= beg_n) & (lane <= end_i)
        last_nz = jnp.max(jnp.where(in_s2 & nz, lane, NEG), axis=1,
                          keepdims=True)
        j_dn = jnp.where(last_nz == NEG, beg_n - 1, last_nz)
        end_n = jnp.minimum(j_dn + 2, qlen)
        beg = jnp.where(alive, beg_n, beg)
        end = jnp.where(alive, end_n, end)
        return (i + 1, eh_h, eh_e, beg, end, best, max_i, max_j,
                max_ie, gscore, max_off, dead)

    init = (jnp.zeros((), I32), eh_h, eh_e, zero1, qlen + 0, h0 + 0,
            zero1 - 1, zero1 - 1, zero1 - 1, zero1 - 1, zero1,
            jnp.zeros((J, 1), bool))
    (_, eh_h, eh_e, beg, end, best, max_i, max_j, max_ie, gscore,
     max_off, dead) = jax.lax.while_loop(cond, body, init)
    res = jnp.concatenate(
        [best, max_j + 1, max_i + 1, max_ie + 1, gscore, max_off,
         jnp.zeros((J, 128 - 6), I32)], axis=1)
    out_ref[:, :] = res


@functools.partial(
    jax.jit,
    static_argnames=("a", "b", "o_del", "e_del", "o_ins", "e_ins",
                     "zdrop", "tmax", "interpret"))
def extend_batch_pallas(q, t, params, a, b, o_del, e_del, o_ins, e_ins,
                        zdrop, tmax, interpret=False):
    """q: int32 [N, LANES]; t: int32 [N, tmax]; params: int32 [N, 128]
    (lanes 0..4 = qlen, tlen, h0, w, end_bonus).  N % JOBS == 0.
    Returns int32 [N, 128] (lanes 0..5 = score,qle,tle,gtle,gscore,
    max_off)."""
    N = q.shape[0]
    grid = (N // JOBS,)
    kernel = functools.partial(
        _extend_kernel, a=a, b=b, o_del=o_del, e_del=e_del, o_ins=o_ins,
        e_ins=e_ins, zdrop=zdrop, tmax=tmax)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((JOBS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JOBS, t.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((JOBS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((JOBS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 128), I32),
        interpret=interpret,
    )(q, t, params)


def _mat_ab(mat):
    """Extract (a, b) from a bwa_fill_scmat-structured matrix; None if
    the matrix doesn't have that structure."""
    mat = np.asarray(mat)
    a = int(mat[0, 0])
    b = -int(mat[0, 1])
    ok = True
    for i in range(4):
        for j in range(4):
            ok &= int(mat[i, j]) == (a if i == j else -b)
    ok &= np.all(mat[4, :] == -1) and np.all(mat[:, 4] == -1)
    return (a, b) if ok else None


def extend_batch_pallas_np(jobs, mat, o_del, e_del, o_ins, e_ins, zdrop,
                           qmax, tmax, interpret=None):
    """Dispatch-layer adapter: list of job dicts -> 6 result arrays.
    Falls back to the XLA path for non-scmat matrices or oversize."""
    ab = _mat_ab(mat)
    if ab is None or qmax > LANES - 1:
        from .extend import extend_batch_np
        return extend_batch_np(jobs, mat, o_del, e_del, o_ins, e_ins,
                               zdrop, qmax, tmax)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    n = len(jobs)
    order = sorted(range(n), key=lambda i: -len(jobs[i]["t"]))
    N = ((n + JOBS - 1) // JOBS) * JOBS
    q = np.full((N, LANES), 4, np.int32)
    t = np.full((N, tmax), 4, np.int32)
    p = np.zeros((N, 128), np.int32)
    p[:, 2] = 1  # h0 for padding jobs (assert h0 > 0)
    for slot, i in enumerate(order):
        j = jobs[i]
        ql, tl = len(j["q"]), len(j["t"])
        q[slot, :ql] = j["q"]
        t[slot, :tl] = j["t"]
        p[slot, :5] = (ql, tl, j["h0"], j["w"], j["end_bonus"])
    res = np.asarray(extend_batch_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(p), ab[0], ab[1],
        o_del, e_del, o_ins, e_ins, zdrop, tmax, interpret))
    out = np.zeros((6, n), np.int32)
    for slot, i in enumerate(order):
        out[:, i] = res[slot, :6]
    return tuple(out)
