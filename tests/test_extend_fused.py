"""Fused per-seed extension (device/extend_fused.py) vs the scalar
upstream trial loops (mem_chain2aln band-doubling protocol)."""
import numpy as np
import pytest

from tpubwa.device.extend_fused import (extend_seed_batch_np,
                                        scalar_fused)
from tpubwa.opts import MemOpt


def _rand_job(rng, l_query=100):
    """A random seed inside a random query/target window, mutations
    sprinkled so retries/zdrop paths trigger."""
    qbeg = int(rng.integers(0, l_query - 19))
    slen = int(rng.integers(19, min(40, l_query - qbeg)))
    qe = qbeg + slen
    q = rng.integers(0, 4, l_query).astype(np.uint8)
    tlen_l = int(rng.integers(0, 150)) if qbeg else 0
    tlen_r = int(rng.integers(0, 150)) if l_query - qe else 0
    tl = rng.integers(0, 4, max(tlen_l, 1)).astype(np.uint8)
    tr = rng.integers(0, 4, max(tlen_r, 1)).astype(np.uint8)
    # half the jobs: target echoes the query (high-score path)
    if rng.random() < 0.5:
        n = min(tlen_l, qbeg)
        tl[:n] = q[:qbeg][::-1][:n]
        n = min(tlen_r, l_query - qe)
        tr[:n] = q[qe:][:n]
        mut = rng.random(len(tl)) < 0.08
        tl[mut] = (tl[mut] + 1) % 4
        mut = rng.random(len(tr)) < 0.08
        tr[mut] = (tr[mut] + 1) % 4
    return (qbeg, q[:qbeg][::-1].copy(), tlen_l, tl[:tlen_l],
            l_query - qe, q[qe:].copy(), tlen_r, tr[:tlen_r],
            100, slen, 5, 5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_matches_scalar(seed):
    opt = MemOpt()
    mat = opt.scoring_matrix()
    rng = np.random.default_rng(seed)
    jobs = [_rand_job(rng) for _ in range(40)]
    got = extend_seed_batch_np(jobs, mat, opt.o_del, opt.e_del,
                               opt.o_ins, opt.e_ins, opt.zdrop,
                               256, 512)
    for i, j in enumerate(jobs):
        want = scalar_fused(j, mat, opt.o_del, opt.e_del, opt.o_ins,
                            opt.e_ins, opt.zdrop)
        # compare the lanes the host consumes: selected left tuple when
        # there is a left part, right tuple when there is a right part,
        # bands and chained scores always
        if j[0] > 0:
            assert got[i, :6].tolist() == want[:6].tolist(), (i, j[:1])
            assert got[i, 12] == want[12]
        if j[4] > 0:
            assert got[i, 6:12].tolist() == want[6:12].tolist(), i
            assert got[i, 13] == want[13]
        assert got[i, 14] == want[14]
        assert got[i, 15] == want[15]
