"""bwacore.cpp emit phase vs the Python reference: byte equality of
the emitted SAM for SE and PE batches covering pairing, mate rescue,
unmapped ends, repeats/XA, split reads, quals, RG and comments."""
import copy

import numpy as np
import pytest

from tpubwa.host.native_emit import emit_batch_native, _lib
from tpubwa.host.pipeline import align_phase, emit_phase
from tpubwa.index import FMIndex
from tpubwa.index.build import BntSeq, SeqAnn
from tpubwa.io.fastq import Read
from tpubwa.opts import MEM_F_PE, MemOpt


@pytest.fixture(scope="module")
def setup():
    if _lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(31)
    n = 60000
    codes = rng.integers(0, 4, n).astype(np.uint8)
    codes[30000:31500] = codes[5000:6500]   # repeats -> XA/secondary
    codes[45000:45400] = codes[5100:5500]
    bnt = BntSeq(l_pac=n,
                 anns=[SeqAnn(name="cA", anno="", offset=0,
                              length=35000, n_ambs=0),
                       SeqAnn(name="cB", anno="", offset=35000,
                              length=25000, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    return FMIndex.build(bnt), codes, np.random.default_rng(7)


def _pairs(codes, rng, n_pairs, corrupt_every=0):
    reads = []
    L = len(codes)
    for i in range(n_pairs):
        isize = max(int(rng.normal(320, 40)), 220)
        pos = int(rng.integers(0, L - isize - 2))
        r1 = codes[pos:pos + 100].copy()
        r2 = (3 - codes[pos + isize - 100:pos + isize])[::-1].copy()
        for r in (r1, r2):
            mut = rng.random(100) < 0.03
            r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        if corrupt_every and i % corrupt_every == 0:
            r2[:] = rng.integers(0, 4, 100)  # unmappable mate
        qual = "".join(chr(33 + int(q))
                       for q in rng.integers(20, 40, 100))
        reads.append(Read(name=f"p{i}", seq=r1, qual=qual,
                          comment="BC:Z:ACGT" if i % 3 == 0 else ""))
        reads.append(Read(name=f"p{i}", seq=r2, qual=qual))
    return reads


def _compare(opt, fmi, reads, n_processed, rg_id, pes0=None):
    mat = opt.scoring_matrix()
    all_regs = align_phase(opt, fmi, reads, mat)
    regs_native = copy.deepcopy(all_regs)
    if opt.flag & MEM_F_PE:
        from tpubwa.host.pair import pestat
        pes = pes0 or pestat(opt, fmi.bnt.l_pac, all_regs)
    else:
        pes = None
    want = emit_phase(opt, fmi, reads, all_regs, n_processed, mat,
                      rg_id, pes0=pes)
    got = emit_batch_native(opt, fmi, reads, regs_native, n_processed,
                            rg_id, pes)
    assert got is not None
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert a == b, (a, b)


def test_pe_equality(setup):
    fmi, codes, rng = setup
    opt = MemOpt(flag=MEM_F_PE)
    reads = _pairs(codes, rng, 60, corrupt_every=9)
    _compare(opt, fmi, reads, 1234, "grp1")


def test_pe_split_and_chimeric(setup):
    fmi, codes, rng = setup
    opt = MemOpt(flag=MEM_F_PE)
    reads = []
    for i in range(16):
        p1 = int(rng.integers(0, 20000))
        p2 = int(rng.integers(36000, 55000))
        chim = np.concatenate([codes[p1:p1 + 55],
                               codes[p2:p2 + 45]]).copy()
        mate = (3 - codes[p1 + 200:p1 + 300])[::-1].copy()
        reads.append(Read(name=f"c{i}", seq=chim, qual=None))
        reads.append(Read(name=f"c{i}", seq=mate, qual=None))
    _compare(opt, fmi, reads, 0, "")


def test_se_equality(setup):
    fmi, codes, rng = setup
    opt = MemOpt()
    reads = []
    for i in range(80):
        pos = int(rng.integers(0, len(codes) - 100))
        r = codes[pos:pos + 100].copy()
        mut = rng.random(100) < 0.04
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        if i % 11 == 0:
            r[:] = rng.integers(0, 4, 100)  # unmapped
        if i % 7 == 0:  # split read across contigs
            p2 = int(rng.integers(36000, 55000))
            r = np.concatenate([r[:50], codes[p2:p2 + 50]]).copy()
        reads.append(Read(name=f"s{i}", seq=r, qual=None))
    _compare(opt, fmi, reads, 777, "")


def test_chain_batch_equality(setup):
    """Native chain stage vs Python mem_chain/chain_flt/
    flt_chained_seeds: identical chain order, seeds and frac_rep."""
    from tpubwa.host.chain import chain_flt, flt_chained_seeds, mem_chain
    from tpubwa.host.native_emit import chain_batch_native
    from tpubwa.ref.smem import collect_intv, sa_positions
    fmi, codes, rng = setup
    opt = MemOpt()
    mat = opt.scoring_matrix()
    reads = []
    for i in range(40):
        pos = int(rng.integers(0, len(codes) - 100))
        r = codes[pos:pos + 100].copy()
        mut = rng.random(100) < 0.03
        r[mut] = (r[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        reads.append(Read(name=f"q{i}", seq=r, qual=None))
    intv_rows = []
    positions = []
    for r in reads:
        ivs = collect_intv(opt, fmi, r.seq)
        intv_rows.append(np.asarray(
            [(p.x0, p.x1, p.size, p.qb, p.qe) for p in ivs],
            np.int64).reshape(-1, 5))
        positions.append([
            np.asarray([rb for rb, _ in sa_positions(fmi, p,
                                                     opt.max_occ)],
                       np.int64) for p in ivs])
    got = chain_batch_native(opt, fmi, reads, intv_rows, positions)
    assert got is not None
    for ri, r in enumerate(reads):
        ivs = [  # rebuild BwtIntv objects for the python path
            __import__("tpubwa.ref.smem", fromlist=["BwtIntv"]).BwtIntv(
                int(x[0]), int(x[1]), int(x[2]), int(x[3]), int(x[4]))
            for x in intv_rows[ri]]
        want = mem_chain(opt, fmi, r.seq, intvs=ivs,
                         positions=positions[ri])
        want = chain_flt(opt, want)
        flt_chained_seeds(opt, fmi.bnt, r.l_seq, r.seq, want, mat)
        assert len(got[ri]) == len(want), ri
        for cg, cw in zip(got[ri], want):
            assert cg.rid == cw.rid and cg.is_alt == cw.is_alt
            assert abs(cg.frac_rep - cw.frac_rep) < 1e-12
            assert [(s.rbeg, s.qbeg, s.len, s.score)
                    for s in cg.seeds] == \
                   [(s.rbeg, s.qbeg, s.len, s.score) for s in cw.seeds]


@pytest.mark.parametrize("flags", [
    0x8,            # -a: output all alignments (no XA, secondaries out)
    0x200,          # -Y: soft-clip supplementary
    0x10,           # -M: mark shorter split hits as secondary
    0x8 | 0x200,
])
def test_pe_flag_combinations(setup, flags):
    fmi, codes, rng = setup
    opt = MemOpt(flag=MEM_F_PE | flags)
    reads = _pairs(codes, rng, 24, corrupt_every=7)
    _compare(opt, fmi, reads, 42, "rgX")


@pytest.mark.parametrize("flags", [0x8, 0x10, 0x200])
def test_se_flag_combinations(setup, flags):
    fmi, codes, rng = setup
    opt = MemOpt(flag=flags)
    reads = []
    for i in range(30):
        pos = int(rng.integers(0, len(codes) - 100))
        r = codes[pos:pos + 100].copy()
        if i % 5 == 0:  # split read
            p2 = int(rng.integers(36000, 55000))
            r = np.concatenate([r[:50], codes[p2:p2 + 50]]).copy()
        reads.append(Read(name=f"f{i}", seq=r, qual=None))
    _compare(opt, fmi, reads, 5, "")


def test_pe_nopairing_norescue(setup):
    fmi, codes, rng = setup
    opt = MemOpt(flag=MEM_F_PE | 0x4 | 0x20)  # -P -S
    reads = _pairs(codes, rng, 20)
    _compare(opt, fmi, reads, 9, "")


def test_flat_regs_roundtrip_and_equality(setup):
    """FlatRegs (the planner->emit flat-array path) must reproduce the
    object path exactly: pestat bounds, emitted SAM, and the lazy
    AlnReg view."""
    from tpubwa.host.native_emit import FlatRegs
    from tpubwa.host.pair import pestat
    fmi, codes, rng = setup
    opt = MemOpt(flag=MEM_F_PE)
    mat = opt.scoring_matrix()
    reads = _pairs(codes, rng, 40, corrupt_every=7)
    all_regs = align_phase(opt, fmi, reads, mat)
    flat = FlatRegs.from_lists(all_regs)
    # lazy view reproduces the objects field-for-field
    for i in range(len(all_regs)):
        got, want = flat[i], all_regs[i]
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g.rb, g.re, g.qb, g.qe, g.rid, g.score, g.sub,
                    g.secondary, g.frac_rep) == \
                   (w.rb, w.re, w.qb, w.qe, w.rid, w.score, w.sub,
                    w.secondary, w.frac_rep)
    # pestat over FlatRegs == pestat over objects
    pf = pestat(opt, fmi.bnt.l_pac, flat)
    po = pestat(opt, fmi.bnt.l_pac, all_regs)
    for a, b in zip(pf, po):
        assert (a.failed, a.low, a.high, a.avg, a.std) == \
               (b.failed, b.low, b.high, b.avg, b.std)
    # native emit from FlatRegs == native emit from objects
    got = emit_batch_native(opt, fmi, reads, flat, 0, "", pf)
    want = emit_batch_native(opt, fmi, reads, all_regs, 0, "", po)
    assert got is not None and got == want
    # concat splits cleanly
    half = len(all_regs) // 2
    f2 = FlatRegs.concat([FlatRegs.from_lists(all_regs[:half]),
                          FlatRegs.from_lists(all_regs[half:])])
    assert (f2.cnt == flat.cnt).all() and (f2.iv == flat.iv).all() \
        and (f2.fr == flat.fr).all()
