"""Index-layer property tests: occ/SA vs naive scans, format roundtrips,
lrand48 bit-exactness vs glibc (SURVEY.md §4 item 3)."""
import ctypes
import ctypes.util

import numpy as np
import pytest

from tpubwa.index import FMIndex, LRand48, fasta2bnt
from tpubwa.index.build import pack_pac, unpack_pac
from tpubwa.index.sa import suffix_array, bwt_from_sa


def test_lrand48_matches_glibc():
    path = ctypes.util.find_library("c")
    libc = ctypes.CDLL(path)
    libc.srand48(11)
    libc.lrand48.restype = ctypes.c_long
    ours = LRand48(11)
    for _ in range(1000):
        assert ours.next() == libc.lrand48()


def test_pac_roundtrip(rng):
    for n in [1, 3, 4, 5, 1023]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(unpack_pac(pack_pac(codes), n), codes)


def test_suffix_array_vs_naive(rng):
    for n in [1, 2, 7, 100, 500]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sa = suffix_array(codes)
        # naive: sentinel smaller than all => shorter suffix that is a
        # prefix of another sorts first; emulate by comparing tuples with
        # terminal -1
        naive = sorted(range(n + 1),
                       key=lambda i: tuple(int(c) for c in codes[i:]) + (-1,))
        assert np.array_equal(sa, np.array(naive))


def _naive_conceptual_bwt(text):
    """(n+1)-row conceptual BWT with sentinel char = 4."""
    n = len(text)
    sa = suffix_array(text)
    bwt = np.where(sa == 0, 4, text[(sa - 1) % (n if n else 1)])
    return sa, bwt


def test_occ_and_sa_vs_naive(small_fasta):
    path, _ = small_fasta
    fmi = FMIndex.from_fasta(path)
    text = fmi.bnt.doubled()
    n = fmi.seq_len
    sa_full, cbwt = _naive_conceptual_bwt(text)
    assert int(np.flatnonzero(cbwt == 4)[0]) == fmi.primary
    # occ at a sample of conceptual rows, all 4 bases
    ks = np.unique(np.concatenate([
        np.array([-1, 0, 1, fmi.primary - 1, fmi.primary, fmi.primary + 1,
                  n - 1, n]),
        np.random.default_rng(1).integers(0, n + 1, 200)]))
    for k in ks:
        k = int(k)
        for c in range(4):
            naive = int((cbwt[:k + 1] == c).sum()) if k >= 0 else 0
            if k == n:
                naive = int((cbwt == c).sum())
            assert fmi.occ(k, c) == naive, (k, c)
    # SA lookup at random ranks vs directly-built SA
    for k in np.random.default_rng(2).integers(1, n + 1, 100):
        assert fmi.sa(int(k)) == int(sa_full[int(k)])


def test_backward_search_finds_all_occurrences(small_fasta, rng):
    path, _ = small_fasta
    fmi = FMIndex.from_fasta(path)
    text = fmi.bnt.doubled()
    n = fmi.seq_len
    sa_full = suffix_array(text)
    for _ in range(30):
        ln = int(rng.integers(5, 25))
        start = int(rng.integers(0, n - ln))
        pat = text[start:start + ln]
        # standard backward search using conceptual-row occ
        k, l = 0, n  # rows [k..l] inclusive, starting with all rows
        for c in pat[::-1]:
            c = int(c)
            k = int(fmi.L2[c]) + fmi.occ(k - 1, c) + 1
            l = int(fmi.L2[c]) + fmi.occ(l, c)
            if k > l:
                break
        naive_hits = sorted(
            i for i in range(n - ln + 1)
            if np.array_equal(text[i:i + ln], pat))
        if k > l:
            assert naive_hits == []
        else:
            hits = sorted(fmi.sa(r) for r in range(k, l + 1))
            assert hits == naive_hits


def test_npz_roundtrip(small_fasta, tmp_path):
    path, _ = small_fasta
    fmi = FMIndex.from_fasta(path)
    fmi.save(str(tmp_path / "idx"))
    fmi2 = FMIndex.load(str(tmp_path / "idx"))
    assert fmi2.seq_len == fmi.seq_len and fmi2.primary == fmi.primary
    assert np.array_equal(fmi2.bwt_words, fmi.bwt_words)
    assert np.array_equal(fmi2.sa_sample, fmi.sa_sample)
    assert np.array_equal(fmi2.bnt.codes, fmi.bnt.codes)
    assert [a.name for a in fmi2.bnt.anns] == [a.name for a in fmi.bnt.anns]


def test_bwa_format_roundtrip(small_fasta, tmp_path):
    path, _ = small_fasta
    fmi = FMIndex.from_fasta(path)
    prefix = str(tmp_path / "bwaidx")
    fmi.save_bwa(prefix)
    fmi2 = FMIndex.load_bwa(prefix)
    assert fmi2.seq_len == fmi.seq_len and fmi2.primary == fmi.primary
    assert np.array_equal(fmi2.bwt_words, fmi.bwt_words)
    assert np.array_equal(fmi2.occ_ckpt, fmi.occ_ckpt)
    assert np.array_equal(fmi2.sa_sample, fmi.sa_sample)
    assert np.array_equal(fmi2.bnt.codes, fmi.bnt.codes)


def test_fetch_seq_and_folding(small_fasta):
    path, _ = small_fasta
    bnt = fasta2bnt(path)
    text = bnt.doubled()
    L = bnt.l_pac
    # get_seq equals doubled-text slices everywhere
    rngl = np.random.default_rng(3)
    for _ in range(50):
        b = int(rngl.integers(0, 2 * L - 1))
        e = int(rngl.integers(b + 1, min(b + 40, 2 * L) + 1))
        assert np.array_equal(bnt.get_seq(b, e), text[b:e])
    # depos folds reverse-image coordinates symmetrically
    for pos in [0, 1, L - 1, L, 2 * L - 1]:
        f, rev = bnt.depos(pos)
        if rev:
            assert f == 2 * L - 1 - pos
        else:
            assert f == pos


def test_shm_cache_roundtrip(tmp_path):
    """bwa shm analogue: mmap cache loads bit-identical index and the
    CLI prefers it (SURVEY.md §2 row 20)."""
    import numpy as np
    from tpubwa.cli import load_index, main_shm
    from tpubwa.index import FMIndex
    from tpubwa.index.build import BntSeq, SeqAnn
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, 5000).astype(np.uint8)
    bnt = BntSeq(l_pac=5000, anns=[SeqAnn(name="s", anno="", offset=0,
                                          length=5000, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    prefix = str(tmp_path / "ref.fa")
    fmi.save(prefix)
    assert main_shm([prefix]) == 0
    got = load_index(prefix)
    assert isinstance(got.bnt.codes, np.memmap)
    assert np.array_equal(np.asarray(got.bwt_words), fmi.bwt_words)
    assert np.array_equal(np.asarray(got.sa_sample), fmi.sa_sample)
    assert np.array_equal(np.asarray(got.bnt.codes), codes)
    assert got.primary == fmi.primary and got.seq_len == fmi.seq_len
    # queries through the mmap'd index work
    assert got.sa(32) == fmi.sa(32)
    assert got.occ(1234, 2) == fmi.occ(1234, 2)
    assert main_shm(["-d", prefix]) == 0
    import os
    assert not os.path.isdir(prefix + ".tpubwa.shm")


def test_alt_file_marks_contigs(tmp_path):
    """<prefix>.alt marks ALT contigs at load (bwa.c idx load)."""
    import numpy as np
    from tpubwa.cli import load_index
    from tpubwa.index import FMIndex
    from tpubwa.index.build import BntSeq, SeqAnn
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, 4000).astype(np.uint8)
    bnt = BntSeq(l_pac=4000,
                 anns=[SeqAnn(name="chr1", anno="", offset=0,
                              length=2000, n_ambs=0),
                       SeqAnn(name="chr1_alt", anno="", offset=2000,
                              length=2000, n_ambs=0)],
                 ambs=[], seed=11, codes=codes)
    fmi = FMIndex.build(bnt)
    prefix = str(tmp_path / "ref.fa")
    fmi.save(prefix)
    (tmp_path / "ref.fa.alt").write_text("chr1_alt\t4\t*\t0\t0\t*\t*\t0\t0\n")
    got = load_index(prefix)
    assert [a.is_alt for a in got.bnt.anns] == [0, 1]
