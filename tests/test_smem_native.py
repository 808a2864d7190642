"""Native scalar SMEM (native/smem.cpp) == Python oracle (ref/smem.py):
the production host fallback must be bit-identical to the reference
on random texts, repeats, N runs and one-shot reseed jobs."""
import numpy as np
import pytest

from tpubwa.host.native_smem import (collect_intv_native,
                                     smem_jobs_native, _lib)
from tpubwa.index import FMIndex
from tpubwa.opts import MemOpt
from tpubwa.ref.smem import collect_intv, smem1a


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(77)
    unit = rng.integers(0, 4, 31).astype(np.uint8)
    codes = np.concatenate([
        rng.integers(0, 4, 2500).astype(np.uint8), np.tile(unit, 5),
        rng.integers(0, 4, 2500).astype(np.uint8)])
    p = tmp_path_factory.mktemp("nsmem") / "g.fa"
    p.write_text(">g\n" + "".join("ACGT"[c] for c in codes) + "\n")
    return FMIndex.from_fasta(str(p)), codes, unit


def _need_lib():
    if _lib() is None:
        pytest.skip("native smem unavailable")


def test_collect_intv_native_equals_oracle(setup):
    _need_lib()
    fmi, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(3)
    opt = MemOpt()
    reads = []
    for t in range(25):
        start = int(rng.integers(0, len(codes) - 160))
        q = text[start:start + int(rng.integers(60, 151))].copy()
        for _ in range(int(rng.integers(0, 8))):
            q[int(rng.integers(0, len(q)))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 5)[:120].copy())          # repeat
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))  # garbage
    q = text[300:400].copy()
    q[30:35] = 4                                         # N run
    reads.append(q)
    reads.append(np.full(40, 4, np.uint8))               # all N
    for i, q in enumerate(reads):
        want = [(m.x0, m.x1, m.size, m.qb, m.qe)
                for m in collect_intv(opt, fmi, q)]
        got = collect_intv_native(opt, fmi, q)
        assert got is not None
        assert [tuple(int(v) for v in r) for r in got] == want, i


def test_collect_intv_native_round3(setup):
    """max_mem_intv > 0 exercises seed_strategy1 (round 3)."""
    _need_lib()
    fmi, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt(max_mem_intv=20)
    rng = np.random.default_rng(5)
    for t in range(8):
        start = int(rng.integers(0, len(codes) - 160))
        q = text[start:start + 120].copy()
        for _ in range(4):
            q[int(rng.integers(0, len(q)))] = int(rng.integers(0, 5))
        want = [(m.x0, m.x1, m.size, m.qb, m.qe)
                for m in collect_intv(opt, fmi, q)]
        got = collect_intv_native(opt, fmi, q)
        assert [tuple(int(v) for v in r) for r in got] == want, t


def test_smem_jobs_native_equals_scalar_full(setup):
    """The _scalar_full batch contract: mixed one-shot reseeds and
    full-protocol jobs, exact row order and rid column."""
    _need_lib()
    fmi, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(9)
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    B, L = 6, 120
    reads = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    seqs = [text[100:220].copy(), np.tile(unit, 5)[:120].copy(),
            text[900:1020].copy(), rng.integers(0, 4, 120),
            text[40:160].copy(), text[500:620].copy()]
    seqs[2][60:64] = 4
    for i, s in enumerate(seqs):
        reads[i, :len(s)] = s
        lens[i] = len(s)
    jobs = [(0, 0, 1, False), (1, 0, 1, False), (2, 0, 1, False),
            (3, 30, 2, True), (4, 60, 3, True), (5, 0, 1, False)]
    got = smem_jobs_native(opt, fmi, reads, lens, split_len, jobs)
    assert got is not None
    # Python reference emission (the pre-native _scalar_full body)
    import tpubwa.device.smem_fused as sf
    from tpubwa.device.smem import _scalar_reseed, _scalar_round1
    rows_out, rids_out = [], []
    for (ri, x, mi, osh) in jobs:
        if osh:
            rows = _scalar_reseed(opt, fmi, reads[ri], int(lens[ri]),
                                  x, mi)
            rows_out.append(rows)
            rids_out.append(np.full(len(rows), ri, np.int64))
            continue
        rows = _scalar_round1(opt, fmi, reads[ri], int(lens[ri]))
        rows_out.append(rows)
        rids_out.append(np.full(len(rows), ri, np.int64))
        rid_, jx_, jmi_ = sf._r2_jobs_from(
            opt, split_len, np.int64, rows,
            np.full(len(rows), ri, np.int64))
        for k in range(len(rid_)):
            rr = _scalar_reseed(opt, fmi, reads[int(rid_[k])],
                                int(lens[int(rid_[k])]),
                                int(jx_[k]), int(jmi_[k]))
            rows_out.append(rr)
            rids_out.append(np.full(len(rr), int(rid_[k]), np.int64))
    want_rows = np.concatenate(rows_out) if rows_out else \
        np.zeros((0, 5), np.int64)
    want_rids = np.concatenate(rids_out) if rids_out else \
        np.zeros(0, np.int64)
    assert np.array_equal(got[:, :5], want_rows)
    assert np.array_equal(got[:, 5], want_rids)


def test_smem1a_native_fuzz_small_texts(setup):
    """Per-call smem1a parity on many random (x, min_intv) jobs via
    the one-shot job path."""
    _need_lib()
    fmi, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(13)
    opt = MemOpt()
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    L = 90
    for trial in range(30):
        start = int(rng.integers(0, len(codes) - L - 5))
        q = text[start:start + L].copy()
        for _ in range(int(rng.integers(0, 6))):
            q[int(rng.integers(0, L))] = int(rng.integers(0, 5))
        x = int(rng.integers(0, L))
        mi = int(rng.integers(1, 6))
        reads = q[None, :].copy()
        lens = np.asarray([L], np.int32)
        got = smem_jobs_native(opt, fmi, reads, lens, split_len,
                               [(0, x, mi, True)])
        tmp = []
        smem1a(fmi, q, x, mi, 0, tmp)
        want = [(m.x0, m.x1, m.size, m.qb, m.qe) for m in tmp
                if m.qe - m.qb >= opt.min_seed_len]
        assert [tuple(int(v) for v in r[:5]) for r in got] == want, \
            (trial, x, mi)


def test_sa_positions_native_equals_device(setup):
    """Native bounded SA walk + subsampling == the device sa_lookup
    path on real interval rows (incl. big intervals that subsample)."""
    _need_lib()
    import jax
    from tpubwa.device.occ import DeviceIndex, sa_lookup
    from tpubwa.host.native_smem import sa_positions_native
    import jax.numpy as jnp
    fmi, codes, unit = setup
    didx = DeviceIndex.from_fmindex(fmi)
    opt = MemOpt()
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(21)
    rows = []
    for t in range(12):
        s = int(rng.integers(0, len(codes) - 120))
        q = text[s:s + 100].copy()
        for m in collect_intv(opt, fmi, q):
            rows.append((m.x0, m.x1, m.size, m.qb, m.qe))
    q = np.tile(unit, 5)[:100].copy()        # repetitive: big size
    for m in collect_intv(opt, fmi, q):
        rows.append((m.x0, m.x1, m.size, m.qb, m.qe))
    flat = np.asarray(rows, np.int64)
    got = sa_positions_native(fmi, flat, opt.max_occ)
    assert got is not None
    pos_n, cnt_n = got
    # device reference: same subsampling arithmetic + sa_lookup
    size = flat[:, 2]
    step = np.where(size > opt.max_occ, size // opt.max_occ, 1)
    cnt = np.minimum((size + step - 1) // step, opt.max_occ)
    ranks = np.concatenate([
        flat[i, 0] + np.arange(cnt[i]) * step[i]
        for i in range(len(flat))]).astype(np.int64)
    want = np.asarray(sa_lookup(didx, jnp.asarray(ranks)))
    assert np.array_equal(cnt_n, cnt)
    assert np.array_equal(pos_n, want.astype(np.int64))


def test_collect_batch_threads_deterministic(setup):
    """bwa -t maps to native seeding threads; the contiguous split
    must produce byte-identical rows for any thread count."""
    _need_lib()
    from tpubwa.host.native_smem import smem_collect_batch_native
    fmi, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(31)
    opt = MemOpt(max_mem_intv=20)
    B = 40
    arr = np.full((B, 100), 4, np.uint8)
    lens = np.full(B, 100, np.int32)
    for i in range(B):
        s = int(rng.integers(0, len(codes) - 120))
        arr[i] = text[s:s + 100]
    one = smem_collect_batch_native(opt, fmi, arr, lens, threads=1)
    for t in (2, 3, 7):
        assert np.array_equal(
            one, smem_collect_batch_native(opt, fmi, arr, lens,
                                           threads=t)), t


def test_host_mode_on_markless_bwa_index(setup, tmp_path,
                                         monkeypatch):
    """A stock-bwa-format index has no SA marks: native seeding still
    serves, the native SA walk declines (None), and the device
    rank-walk serves — regions equal the marked npz index's."""
    _need_lib()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tpubwa.device.pipeline import make_device_aligner
    from tpubwa.host.native_smem import sa_positions_native
    from tpubwa.io.fastq import Read
    fmi, codes, unit = setup
    prefix = str(tmp_path / "g")
    fmi.save_bwa(prefix)
    f2 = FMIndex.load_bwa(prefix)
    assert not f2.sa_mark_D
    rows = collect_intv_native(MemOpt(), f2, codes[100:200])
    assert rows is not None and len(rows)
    assert sa_positions_native(f2, rows, 500) is None
    monkeypatch.setenv("TPUBWA_SEED_MODE", "host")
    opt = MemOpt()
    reads = [Read(name=f"r{i}", seq=codes[i * 31:i * 31 + 80].copy(),
                  qual=None) for i in range(15)]
    r1 = make_device_aligner(opt, fmi, platform="cpu")(reads)
    r2 = make_device_aligner(opt, f2, platform="cpu")(reads)
    for i in range(len(reads)):
        k1 = [(x.rb, x.re, x.qb, x.qe, x.score) for x in r1[i]]
        k2 = [(x.rb, x.re, x.qb, x.qe, x.score) for x in r2[i]]
        assert k1 == k2, i


def test_native_fuzz_block_boundary_genomes(tmp_path):
    """Native vs oracle across genome sizes straddling the occ-block
    (128) and word (16) boundaries, with poly/periodic texts and all
    round-3 settings — the index-arithmetic edge cases."""
    _need_lib()
    rng = np.random.default_rng(2024)
    trials = 0
    for n in (127, 128, 129, 2048, 2049):
        for rep in range(3):
            codes = rng.integers(0, 4, n).astype(np.uint8)
            if rep == 1 and n >= 128:
                codes[: n // 2] = codes[0]
            if rep == 2:
                codes = np.tile(codes[:16], n // 16 + 1)[:n].copy()
            p = tmp_path / f"g{n}_{rep}.fa"
            p.write_text(">g\n" + "".join("ACGT"[c] for c in codes)
                         + "\n")
            fmi = FMIndex.from_fasta(str(p))
            for mmi in (0, 20):
                opt = MemOpt(max_mem_intv=mmi)
                for t in range(3):
                    L = int(rng.integers(5, min(n, 150)))
                    s = int(rng.integers(0, n - L + 1))
                    q = np.asarray(fmi.bnt.doubled()[s:s + L]).copy()
                    for _ in range(int(rng.integers(0, 4))):
                        q[int(rng.integers(0, L))] = \
                            int(rng.integers(0, 5))
                    want = [(m.x0, m.x1, m.size, m.qb, m.qe)
                            for m in collect_intv(opt, fmi, q)]
                    got = collect_intv_native(opt, fmi, q)
                    assert [tuple(int(v) for v in r)
                            for r in got] == want, (n, rep, mmi, t)
                    trials += 1
    assert trials == 90
