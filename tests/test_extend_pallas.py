"""Pallas extension kernel vs the scalar oracle (interpret mode on the
CPU backend; the real-TPU run is exercised by bench.py/verify)."""
import numpy as np
import pytest

import tpubwa.device  # noqa: F401
from tpubwa.device.extend_pallas import _mat_ab, extend_batch_pallas_np
from tpubwa.opts import MemOpt
from tpubwa.ref.ksw import ksw_extend
from test_device_extend import _mk_jobs


def test_mat_ab():
    opt = MemOpt()
    assert _mat_ab(opt.scoring_matrix()) == (1, 4)
    assert _mat_ab(MemOpt(a=2, b=9).scoring_matrix()) == (2, 9)
    m = opt.scoring_matrix().astype(np.int32)
    m[1, 2] = 7
    assert _mat_ab(m) is None


@pytest.mark.parametrize("zdrop", [0, 100])
def test_pallas_matches_oracle(zdrop):
    rng = np.random.default_rng(99 + zdrop)
    opt = MemOpt()
    mat = opt.scoring_matrix().astype(np.int32)
    jobs = _mk_jobs(rng, 80, opt)
    got = extend_batch_pallas_np(jobs, mat, opt.o_del, opt.e_del,
                                 opt.o_ins, opt.e_ins, zdrop,
                                 qmax=128, tmax=256, interpret=True)
    for i, j in enumerate(jobs):
        want = ksw_extend(len(j["q"]), j["q"], len(j["t"]), j["t"], mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          j["w"], j["end_bonus"], zdrop, j["h0"])
        g = tuple(int(x[i]) for x in got)
        w = (want.score, want.qle, want.tle, want.gtle, want.gscore,
             want.max_off)
        assert g == w, (i, g, w)


def test_pallas_nonstandard_matrix_falls_back():
    rng = np.random.default_rng(3)
    opt = MemOpt()
    mat = opt.scoring_matrix().astype(np.int32)
    mat[0, 1] = -2  # break scmat structure -> XLA fallback
    jobs = _mk_jobs(rng, 10, opt)
    got = extend_batch_pallas_np(jobs, mat, opt.o_del, opt.e_del,
                                 opt.o_ins, opt.e_ins, 100,
                                 qmax=128, tmax=256)
    for i, j in enumerate(jobs):
        want = ksw_extend(len(j["q"]), j["q"], len(j["t"]), j["t"], mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          j["w"], j["end_bonus"], 100, j["h0"])
        assert int(got[0][i]) == want.score
