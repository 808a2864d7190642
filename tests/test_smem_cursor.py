"""Lockstep bwt_smem1a cursor machine vs the scalar reference
(smem_cursor.py; spec = ref/smem.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from tpubwa.device.occ import DeviceIndex
from tpubwa.device.smem import collect_intv_device
from tpubwa.device.smem_cursor import run_smem_jobs
from tpubwa.index import FMIndex
from tpubwa.index.build import BntSeq, SeqAnn
from tpubwa.opts import MemOpt
from tpubwa.ref.smem import collect_intv, smem1a


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(77)
    n = 60000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    # plant repeats so re-seeding and deep stacks trigger
    codes[20000:21000] = codes[1000:2000]
    codes[40000:40500] = codes[1500:2000]
    bnt = BntSeq(l_pac=n, anns=[SeqAnn(name="c", anno="", offset=0,
                                       length=n, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    didx = DeviceIndex.from_fmindex(fmi)
    return fmi, didx, codes


def _reads(codes, rng, n_reads, L=100, amb=False):
    out = np.full((n_reads, 128), 4, np.uint8)
    lens = np.full(n_reads, L, np.int32)
    for i in range(n_reads):
        pos = int(rng.integers(0, len(codes) - L))
        r = codes[pos:pos + L].copy()
        mut = rng.random(L) < 0.03
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        if amb and i % 3 == 0:
            r[rng.integers(0, L, 2)] = 4  # N bases
        out[i, :L] = r
    return out, lens


def test_cursor_round1_matches_scalar(setup):
    fmi, didx, codes = setup
    opt = MemOpt()
    rng = np.random.default_rng(1)
    reads, lens = _reads(codes, rng, 48, amb=True)
    qd = jnp.asarray(reads)
    ld = jnp.asarray(lens)
    B = len(lens)
    mem, mem_n, ovf = run_smem_jobs(
        didx, qd, ld,
        (np.arange(B, dtype=np.int32), np.zeros(B, np.int32),
         np.ones(B, didx.np_idt), np.zeros(B, bool)),
        opt.min_seed_len)
    for ri in range(B):
        q = reads[ri, :lens[ri]]
        mems, tmp = [], []
        x = 0
        while x < len(q):
            if q[x] < 4:
                x = smem1a(fmi, q, x, 1, 0, tmp)
                mems += [(p.x0, p.x1, p.size, p.qb, p.qe) for p in tmp
                         if p.qe - p.qb >= opt.min_seed_len]
            else:
                x += 1
        if ovf[ri]:
            continue  # fallback path covered in pipeline test
        got = sorted(map(tuple, mem[ri, :int(mem_n[ri])].tolist()))
        assert got == sorted(mems), ri


def test_cursor_reseed_matches_scalar(setup):
    fmi, didx, codes = setup
    opt = MemOpt()
    rng = np.random.default_rng(2)
    reads, lens = _reads(codes, rng, 32)
    qd = jnp.asarray(reads)
    ld = jnp.asarray(lens)
    jobs = [(ri, int(rng.integers(10, 90)), int(rng.integers(2, 12)))
            for ri in range(len(lens))]
    ja = np.asarray(jobs, np.int64)
    mem, mem_n, ovf = run_smem_jobs(
        didx, qd, ld,
        (ja[:, 0].astype(np.int32), ja[:, 1].astype(np.int32),
         ja[:, 2].astype(didx.np_idt), np.ones(len(jobs), bool)),
        opt.min_seed_len)
    for k, (ri, x, mi) in enumerate(jobs):
        if ovf[k]:
            continue
        q = reads[ri, :lens[ri]]
        tmp = []
        smem1a(fmi, q, x, mi, 0, tmp)
        want = sorted((p.x0, p.x1, p.size, p.qb, p.qe) for p in tmp
                      if p.qe - p.qb >= opt.min_seed_len)
        got = sorted(map(tuple, mem[k, :int(mem_n[k])].tolist()))
        assert got == want, (k, ri, x, mi)


def test_collect_intv_cursor_vs_scalar(setup):
    fmi, didx, codes = setup
    opt = MemOpt()
    rng = np.random.default_rng(3)
    reads, lens = _reads(codes, rng, 40, amb=True)
    rows = collect_intv_device(opt, didx, reads, lens, fmi=fmi)
    for ri in range(len(lens)):
        want = collect_intv(opt, fmi, reads[ri, :lens[ri]])
        want_rows = [(p.x0, p.x1, p.size, p.qb, p.qe) for p in want]
        assert [tuple(map(int, r)) for r in rows[ri]] == want_rows, ri


def test_cursor_overflow_fallback(setup, monkeypatch):
    """Tiny stack/emission caps force the overflow path; collect must
    transparently redo those lanes on the host and still match the
    scalar reference exactly."""
    import tpubwa.device.smem as sm
    import tpubwa.device.smem_cursor as scm
    fmi, didx, codes = setup
    opt = MemOpt()
    rng = np.random.default_rng(9)
    reads, lens = _reads(codes, rng, 24, amb=True)
    orig = scm.run_smem_jobs

    def tiny(*args, **kw):
        kw["P"] = 8
        kw["MAXM"] = 2
        return orig(*args, **kw)

    monkeypatch.setattr(scm, "run_smem_jobs", tiny)
    rows = sm.collect_intv_device(opt, didx, reads, lens, fmi=fmi)
    for ri in range(len(lens)):
        want = collect_intv(opt, fmi, reads[ri, :lens[ri]])
        want_rows = [(p.x0, p.x1, p.size, p.qb, p.qe) for p in want]
        assert [tuple(map(int, r)) for r in rows[ri]] == want_rows, ri


def test_cursor_edge_reads(setup):
    """Degenerate lanes: shorter than min_seed_len, all-N, N at the
    cursor start, exact read-length matches."""
    fmi, didx, codes = setup
    opt = MemOpt()
    L = 128
    rows = [
        np.concatenate([codes[100:110], np.full(L - 10, 4, np.uint8)]),
        np.full(L, 4, np.uint8),                       # all N
        np.concatenate([[4, 4], codes[200:300],
                        np.full(L - 102, 4, np.uint8)]),
        np.concatenate([codes[500:628]]),              # full-length
    ]
    lens = np.asarray([10, 60, 102, 128], np.int32)
    reads = np.stack(rows)
    got = collect_intv_device(opt, didx, reads, lens, fmi=fmi)
    for ri in range(len(lens)):
        want = collect_intv(opt, fmi, reads[ri, :lens[ri]])
        want_rows = [(p.x0, p.x1, p.size, p.qb, p.qe) for p in want]
        assert [tuple(map(int, r)) for r in got[ri]] == want_rows, ri
