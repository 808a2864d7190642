"""Batched device extension vs the scalar ksw_extend oracle."""
import numpy as np
import pytest

import tpubwa.device  # noqa: F401
from tpubwa.device.extend import extend_batch_np
from tpubwa.opts import MemOpt
from tpubwa.ref.ksw import ksw_extend


def _mk_jobs(rng, n, opt):
    jobs = []
    for _ in range(n):
        tl = int(rng.integers(3, 120))
        target = rng.integers(0, 4, tl).astype(np.int32)
        ql = int(rng.integers(1, 100))
        if rng.random() < 0.7:  # homologous pair
            base = list(target[:min(ql, tl)])
            for _ in range(int(rng.integers(0, 4))):
                if base:
                    base[int(rng.integers(0, len(base)))] = \
                        int(rng.integers(0, 4))
            for _ in range(int(rng.integers(0, 2))):
                p = int(rng.integers(0, len(base))) if base else 0
                if rng.random() < 0.5 and len(base) > 2:
                    del base[p:p + int(rng.integers(1, 3))]
                else:
                    base[p:p] = [int(rng.integers(0, 4))]
            query = np.array(base[:100], np.int32)
        else:
            query = rng.integers(0, 4, ql).astype(np.int32)
        if len(query) == 0:
            query = np.array([0], np.int32)
        jobs.append(dict(q=query, t=target,
                         h0=int(rng.integers(1, 60)),
                         w=int(rng.choice([3, 10, 100])),
                         end_bonus=int(rng.choice([0, 5]))))
    return jobs


@pytest.mark.parametrize("zdrop", [0, 100])
def test_extend_batch_matches_oracle(zdrop):
    rng = np.random.default_rng(42 + zdrop)
    opt = MemOpt()
    mat = opt.scoring_matrix().astype(np.int32)
    jobs = _mk_jobs(rng, 120, opt)
    got = extend_batch_np(jobs, mat, opt.o_del, opt.e_del, opt.o_ins,
                          opt.e_ins, zdrop, qmax=128, tmax=128)
    for i, j in enumerate(jobs):
        want = ksw_extend(len(j["q"]), j["q"], len(j["t"]), j["t"], mat,
                          opt.o_del, opt.e_del, opt.o_ins, opt.e_ins,
                          j["w"], j["end_bonus"], zdrop, j["h0"])
        g = tuple(int(x[i]) for x in got)
        w = (want.score, want.qle, want.tle, want.gtle, want.gscore,
             want.max_off)
        assert g == w, (i, j["w"], j["h0"], g, w)


def test_extend_batch_asymmetric_gaps():
    rng = np.random.default_rng(7)
    mat = MemOpt(b=2).scoring_matrix().astype(np.int32)
    jobs = _mk_jobs(rng, 60, None)
    for (od, ed, oi, ei) in [(6, 1, 9, 2), (1, 1, 6, 1), (12, 2, 3, 1)]:
        got = extend_batch_np(jobs, mat, od, ed, oi, ei, 50,
                              qmax=128, tmax=128)
        for i, j in enumerate(jobs):
            want = ksw_extend(len(j["q"]), j["q"], len(j["t"]), j["t"],
                              mat, od, ed, oi, ei, j["w"],
                              j["end_bonus"], 50, j["h0"])
            g = tuple(int(x[i]) for x in got)
            w = (want.score, want.qle, want.tle, want.gtle, want.gscore,
                 want.max_off)
            assert g == w, (i, od, ed, oi, ei, g, w)
