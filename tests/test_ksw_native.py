"""Native ksw.cpp kernels vs the NumPy reference in ref/ksw.py."""
import importlib
import os

import numpy as np
import pytest

import tpubwa.ref.ksw as K
from tpubwa.opts import MemOpt


@pytest.fixture(scope="module")
def both():
    lib = K._native()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _py(fn, *a, **kw):
    """Call the NumPy implementation regardless of native."""
    saved = K._NATIVE
    K._NATIVE = False
    try:
        return fn(*a, **kw)
    finally:
        K._NATIVE = saved


def _seqs(rng, ql, tl, echo=0.5):
    q = rng.integers(0, 4, ql).astype(np.uint8)
    t = rng.integers(0, 5, tl).astype(np.uint8)  # includes N
    if rng.random() < echo:
        n = min(ql, tl)
        t[:n] = q[:n]
        mut = rng.random(n) < 0.1
        t[:n][mut] = (t[:n][mut] + 1) % 5
    return q, t


def test_extend_matches(both):
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(0)
    for _ in range(300):
        ql = int(rng.integers(1, 120))
        tl = int(rng.integers(0, 200))
        q, t = _seqs(rng, ql, tl)
        h0 = int(rng.integers(1, 120))
        w = int(rng.integers(1, 120))
        got = K.ksw_extend(ql, q, tl, t, mat, 6, 1, 6, 1, w, 5, 100, h0)
        want = _py(K.ksw_extend, ql, q, tl, t, mat, 6, 1, 6, 1, w, 5,
                   100, h0)
        assert got == want


def test_global_matches(both):
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(1)
    for _ in range(200):
        ql = int(rng.integers(0, 90))
        tl = int(rng.integers(0, 90))
        q, t = _seqs(rng, max(ql, 1), max(tl, 1))
        # contract (as in bwa_gen_cigar2/patch_reg): band covers the
        # length difference
        w = abs(ql - tl) + int(rng.integers(1, 100))
        got = K.ksw_global(ql, q, tl, t, mat, 6, 1, 6, 1, w)
        want = _py(K.ksw_global, ql, q, tl, t, mat, 6, 1, 6, 1, w)
        assert got == want


def test_global_matches_varied_gaps(both):
    """The AVX-512 global_forward_simd (round-5) vectorizes the
    banded global DP — fuzz the direction-matrix bit-identity across
    gap-parameter space, lane boundaries (GVL=16 edges), long
    patch-shaped jobs, and tight bands (w just covering |ql-tl|)."""
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(9)
    for it in range(250):
        if it < 40:   # pin lane-boundary qlens
            ql = (15, 16, 17, 31, 32, 33, 63, 64, 65, 100)[it % 10]
        else:
            ql = int(rng.integers(1, 300))
        tl = max(1, ql + int(rng.integers(-30, 31)))
        q, t = _seqs(rng, ql, tl, echo=0.7)
        od, ed = int(rng.integers(1, 10)), int(rng.integers(1, 7))
        oi, ei = int(rng.integers(1, 10)), int(rng.integers(1, 7))
        # tight AND generous bands; always covering |ql - tl|
        w = abs(ql - tl) + (1 if it % 3 == 0
                            else int(rng.integers(1, 120)))
        got = K.ksw_global(ql, q, tl, t, mat, od, ed, oi, ei, w)
        want = _py(K.ksw_global, ql, q, tl, t, mat, od, ed, oi, ei, w)
        assert got == want, (ql, tl, od, ed, oi, ei, w)


def test_align_matches(both):
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(2)
    for _ in range(200):
        ql = int(rng.integers(1, 110))
        tl = int(rng.integers(1, 300))
        q, t = _seqs(rng, ql, tl, echo=0.7)
        got = K.ksw_align(ql, q, tl, t, mat, 6, 1, 6, 1,
                          minsc=int(rng.integers(0, 40)))
        want = _py(K.ksw_align, ql, q, tl, t, mat, 6, 1, 6, 1,
                   minsc=got.score2 * 0 + int(0))
        # rerun python with same minsc as native call
        want = _py(K.ksw_align, ql, q, tl, t, mat, 6, 1, 6, 1, minsc=0)
        got0 = K.ksw_align(ql, q, tl, t, mat, 6, 1, 6, 1, minsc=0)
        assert got0 == want


def test_align_matches_varied_gaps(both):
    """The SIMD local_forward (AVX-512/AVX2 in ksw.cpp) rewrites the
    F chain as a biased prefix max whose bias terms are e_ins/e_del
    dependent — fuzz across gap-parameter space, read-length block
    boundaries (VLANES edges: 8/16/17/32), and mate-rescue-shaped
    windows (~100x500)."""
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(5)
    for it in range(250):
        if it < 40:   # pin lane-boundary qlens
            ql = (7, 8, 9, 15, 16, 17, 31, 32, 33, 48)[it % 10]
        else:
            ql = int(rng.integers(1, 160))
        tl = int(rng.integers(1, 520))
        q, t = _seqs(rng, ql, tl, echo=0.6)
        od, ed = int(rng.integers(1, 10)), int(rng.integers(1, 7))
        oi, ei = int(rng.integers(1, 10)), int(rng.integers(1, 7))
        got = K.ksw_align(ql, q, tl, t, mat, od, ed, oi, ei, minsc=0)
        want = _py(K.ksw_align, ql, q, tl, t, mat, od, ed, oi, ei,
                   minsc=0)
        assert got == want, (ql, tl, od, ed, oi, ei)
