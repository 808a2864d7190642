"""Cross-ISA check for native/ksw.cpp: the AVX2 flavor must be
bit-identical to the NumPy reference even though the dev machine
compiles -march=native (AVX-512) — build a second .so pinned to
x86-64-v3 (AVX2, no AVX-512) and fuzz ksw_global / ksw_align through
it (round-5: global_forward_simd gained an AVX2 variant)."""
import ctypes
import os
import subprocess

import numpy as np
import pytest

import tpubwa.ref.ksw as K
from tpubwa.native import _CACHE, _DIR
from tpubwa.opts import MemOpt


@pytest.fixture(scope="module")
def avx2lib():
    src = _DIR / "ksw.cpp"
    so = _CACHE / "ksw-avx2-test.so"
    cmd = ["g++", "-O3", "-march=x86-64-v3", "-mno-avx512f",
           "-shared", "-fPIC", "-std=c++20", str(src),
           "-o", str(so) + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError) as e:
        pytest.skip(f"cannot build AVX2 flavor: {e}")
    os.replace(str(so) + ".tmp", so)
    return ctypes.CDLL(str(so))


def _global(lib, q, t, mat, od, ed, oi, ei, w):
    score = ctypes.c_int32()
    ncig = ctypes.c_int32()
    cig = np.zeros(2 * (len(q) + len(t) + 2), np.int32)
    rc = lib.tpubwa_ksw_global(
        len(q), q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(t), t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        5, mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        od, ed, oi, ei, w, 1, ctypes.byref(score),
        cig.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(cig) // 2, ctypes.byref(ncig))
    assert rc == 0
    c = [(int(cig[2 * k]), int(cig[2 * k + 1]))
         for k in range(ncig.value)]
    return int(score.value), c


def _py(fn, *a, **kw):
    saved = K._NATIVE
    K._NATIVE = False
    try:
        return fn(*a, **kw)
    finally:
        K._NATIVE = saved


def test_avx2_global_matches_reference(avx2lib):
    opt = MemOpt()
    mat = opt.scoring_matrix().astype(np.int32)
    rng = np.random.default_rng(17)
    for it in range(150):
        ql = (7, 8, 9, 15, 16, 17, 100)[it % 7] if it < 28 \
            else int(rng.integers(1, 250))
        tl = max(1, ql + int(rng.integers(-25, 26)))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        t = rng.integers(0, 5, tl).astype(np.uint8)
        if rng.random() < 0.7:
            n = min(ql, tl)
            t[:n] = q[:n]
            mut = rng.random(n) < 0.1
            t[:n][mut] = (t[:n][mut] + 1) % 5
        od, ed = int(rng.integers(1, 9)), int(rng.integers(1, 5))
        oi, ei = int(rng.integers(1, 9)), int(rng.integers(1, 5))
        w = abs(ql - tl) + (1 if it % 3 == 0
                            else int(rng.integers(1, 90)))
        got = _global(avx2lib, q, t, mat, od, ed, oi, ei, w)
        want = _py(K.ksw_global, ql, q, tl, t, mat, od, ed, oi, ei, w)
        assert got[0] == want[0] and got[1] == list(want[1]), \
            (ql, tl, od, ed, oi, ei, w)


def test_avx2_align_matches_reference(avx2lib):
    opt = MemOpt()
    mat = opt.scoring_matrix().astype(np.int32)
    rng = np.random.default_rng(23)
    out7 = np.zeros(7, np.int32)
    for it in range(120):
        ql = int(rng.integers(1, 130))
        tl = int(rng.integers(1, 400))
        q = rng.integers(0, 4, ql).astype(np.uint8)
        t = rng.integers(0, 5, tl).astype(np.uint8)
        if rng.random() < 0.7:
            n = min(ql, tl)
            t[:n] = q[:n]
            mut = rng.random(n) < 0.1
            t[:n][mut] = (t[:n][mut] + 1) % 5
        avx2lib.tpubwa_ksw_align(
            ql, q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            tl, t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            5, mat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            6, 1, 6, 1, 0, 1,
            out7.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        want = _py(K.ksw_align, ql, q, tl, t, mat, 6, 1, 6, 1,
                   minsc=0)
        got = tuple(int(x) for x in out7)
        wt = (want.score, want.te, want.qe, want.score2, want.te2,
              want.tb, want.qb)
        assert got == wt, (ql, tl)
