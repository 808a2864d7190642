"""Device lockstep SMEM seeding vs the scalar 3-round oracle."""
import numpy as np
import pytest

import tpubwa.device  # noqa: F401  (x64)
from tpubwa.device.occ import DeviceIndex
from tpubwa.device.smem import collect_intv_device, smems_round1
from tpubwa.index import FMIndex
from tpubwa.opts import MemOpt
from tpubwa.ref.smem import collect_intv, smem1a


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(21)
    # genome with a tandem repeat so re-seeding (round 2) triggers
    unit = rng.integers(0, 4, 35).astype(np.uint8)
    codes = np.concatenate([
        rng.integers(0, 4, 1500).astype(np.uint8), np.tile(unit, 4),
        rng.integers(0, 4, 1500).astype(np.uint8)])
    p = tmp_path_factory.mktemp("dsmem") / "g.fa"
    p.write_text(">g\n" + "".join("ACGT"[c] for c in codes) + "\n")
    fmi = FMIndex.from_fasta(str(p))
    return fmi, DeviceIndex.from_fmindex(fmi), codes, unit


def _pack_reads(reads, L):
    B = len(reads)
    arr = np.full((B, L), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, r in enumerate(reads):
        arr[i, :len(r)] = r
        lens[i] = len(r)
    return arr, lens


def _key(rows):
    return sorted(tuple(int(v) for v in r) for r in rows)


def test_collect_intv_device_equals_scalar(setup):
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(1)
    opt = MemOpt()
    reads = []
    # genome windows with mutations (mix of unique/repetitive/N reads)
    for t in range(12):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        for _ in range(int(rng.integers(0, 6))):
            q[int(rng.integers(0, 100))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 3)[:100].copy())        # repeat read
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))  # garbage
    q = text[700:800].copy()
    q[50] = 4                                          # N in middle
    reads.append(q)
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens)
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_round1_equals_exhaustive_smem1a(setup):
    """Round-1 device output == union of smem1a over every anchor
    (not just the advancing-x anchors) — validates the e(b) rule."""
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt(min_seed_len=1)
    rng = np.random.default_rng(2)
    reads = [text[i * 211:i * 211 + 60].copy() for i in range(5)]
    arr, lens = _pack_reads(reads, 60)
    got = smems_round1(didx, arr, lens, 1)
    tmp = []
    for i, q in enumerate(reads):
        want = set()
        x = 0
        while x < len(q):
            if q[x] < 4:
                x = smem1a(fmi, q, x, 1, 0, tmp)
                want.update((m.qb, m.qe, m.size) for m in tmp)
            else:
                x += 1
        gk = set((int(r[3]), int(r[4]), int(r[2])) for r in got[i])
        assert gk == want, i


def test_round2_min_intv_equivalence(setup):
    """Device constrained reach == smem1a(x, min_intv>1)."""
    from tpubwa.device.smem import smems_reseed
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(3)
    reads = [np.tile(unit, 3)[:90].copy(),
             text[1490:1590].copy()]  # overlapping the repeat start
    arr, lens = _pack_reads(reads, 100)
    tmp = []
    for ri, q in enumerate(reads):
        for x in [10, 45, 70]:
            for mi in [2, 3, 5]:
                if q[x] > 3:
                    continue
                smem1a(fmi, q, x, mi, 0, tmp)
                want = sorted((m.qb, m.qe, m.size, m.x0, m.x1)
                              for m in tmp)
                out = smems_reseed(didx, arr, lens, [(ri, x, mi)], 1)
                gk = sorted((int(r[3]), int(r[4]), int(r[2]), int(r[0]),
                             int(r[1])) for r in out[0][1])
                assert gk == want, (ri, x, mi)


def test_overflow_second_chance_equals_scalar(setup, monkeypatch):
    """Lanes that overflow the main machines (stack P / call MAXC)
    must flow through the deeper second-chance machines — and lanes
    that overflow even those, to the host scalar path — with the
    final SMEM set unchanged.  Forced by shrinking the main caps."""
    import tpubwa.device.smem_split as ss
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(9)
    opt = MemOpt()
    monkeypatch.setattr(ss, "_stack_P", lambda d: 8)  # force stack ovf
    reads = [np.tile(unit, 3)[:100].copy()]           # deep stacks
    for t in range(6):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        reads.append(q)
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="split")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_call_overflow_second_chance(setup):
    """MAXC=1 forces every multi-call lane through the second chance;
    output must still match the scalar oracle."""
    import tpubwa.device.smem_split as ss
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 307:i * 307 + 100].copy() for i in range(5)]
    arr, lens = _pack_reads(reads, 100)
    import jax.numpy as jnp
    qd, ld = jnp.asarray(arr), jnp.asarray(lens)
    split_len = int(opt.min_seed_len * opt.split_factor + 0.499)
    rows, rids = ss.rounds12_split(opt, didx, qd, ld, lens, arr,
                                   split_len, fmi, MAXC=1)
    from tpubwa.device.smem import _scalar_reseed, _scalar_round1
    for i, r in enumerate(reads):
        r1 = _scalar_round1(opt, fmi, r, len(r))
        want = [tuple(int(v) for v in row) for row in r1]
        for row in r1:
            if (row[4] - row[3] >= split_len
                    and row[2] <= opt.split_width):
                r2 = _scalar_reseed(opt, fmi, r, len(r),
                                    int(row[3] + row[4]) >> 1,
                                    int(row[2]) + 1)
                want += [tuple(int(v) for v in x) for x in r2]
        mine = rows[rids == i]
        gk = sorted(tuple(int(v) for v in x) for x in mine)
        assert gk == sorted(want), f"read {i}"


def test_fused_machine_equals_scalar(setup):
    """mode='fused' (one dispatch per round) == scalar oracle,
    including repetitive / N / garbage reads and the second-chance
    retry (forced small caps are covered by the tests above)."""
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(5)
    opt = MemOpt()
    reads = []
    for t in range(10):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        for _ in range(int(rng.integers(0, 6))):
            q[int(rng.integers(0, 100))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 3)[:100].copy())
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))
    q = text[700:800].copy()
    q[50] = 4
    reads.append(q)
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="fused")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_fused_overflow_retry(setup, monkeypatch):
    """Forced tiny caps push lanes through the fused second chance
    and the scalar fallback; output must not change."""
    import tpubwa.device.smem_fused as sf
    import tpubwa.device.smem_split as ss
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    monkeypatch.setattr(ss, "_stack_P", lambda d: 8)
    reads = [np.tile(unit, 3)[:100].copy(),
             text[100:200].copy(), text[400:500].copy()]
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="fused")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_machine_equals_scalar(setup):
    """mode='megaq' (queue-scheduled backward phases) == scalar
    oracle, including repetitive / N / garbage reads."""
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(7)
    opt = MemOpt()
    reads = []
    for t in range(10):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        for _ in range(int(rng.integers(0, 6))):
            q[int(rng.integers(0, 100))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 3)[:100].copy())
    reads.append(rng.integers(0, 4, 100).astype(np.uint8))
    q = text[700:800].copy()
    q[50] = 4
    reads.append(q)
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_overflow_retry(setup, monkeypatch):
    """Forced tiny stack pushes lanes through the megaq deep tail
    machine and scalar fallback; output must not change."""
    import tpubwa.device.smem_split as ss
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    monkeypatch.setattr(ss, "_stack_P", lambda d: 8)
    reads = [np.tile(unit, 3)[:100].copy(),
             text[100:200].copy(), text[400:500].copy()]
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_tail_host_vs_deep_machine(setup, monkeypatch):
    """A tiny flagged tail is redone on the host scalar path by
    default (TPUBWA_TAIL_HOST); forcing the deep machine instead
    (TAIL_HOST=0) must produce identical rows."""
    import tpubwa.device.smem_split as ss
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    monkeypatch.setattr(ss, "_stack_P", lambda d: 8)  # force overflow
    reads = [np.tile(unit, 3)[:100].copy(),
             text[150:250].copy(), text[420:520].copy()]
    arr, lens = _pack_reads(reads, 100)
    monkeypatch.setenv("TPUBWA_TAIL_HOST", "0")   # deep machine
    deep = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                               mode="megaq")
    monkeypatch.setenv("TPUBWA_TAIL_HOST", "64")  # host redo
    host = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                               mode="megaq")
    for i, r in enumerate(reads):
        want = sorted((m.x0, m.x1, m.size, m.qb, m.qe)
                      for m in collect_intv(opt, fmi, r))
        assert _key(deep[i]) == want, f"deep path read {i}"
        assert _key(host[i]) == want, f"host path read {i}"


def test_hybrid_mode_equals_scalar(setup, monkeypatch):
    """mode='hybrid' (device megaq share + native host share merged)
    must match the scalar oracle row-for-row, including the fused-SA
    contract across the seam.  AUTO=0 pins the split: on CPU the
    auto-balancer correctly drives the device fraction to the floor
    (degrading to host mode), which would bypass the seam.
    K_FLOOR=16 lowers the device-share floor (default 64, sized for
    8192-read production chunks) so the 201-read corpus GENUINELY
    crosses the seam: k = 50 reads on the megaq machine, 151 on the
    native host path, merged."""
    monkeypatch.setenv("TPUBWA_HYBRID_AUTO", "0")
    monkeypatch.setenv("TPUBWA_HYBRID_K_FLOOR", "16")
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(23)
    opt = MemOpt()
    reads = []
    for t in range(200):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        for _ in range(int(rng.integers(0, 5))):
            q[int(rng.integers(0, 100))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="hybrid")
    for i in (0, 1, 50, 89, 90, 91, 150, 199, 200):  # spans the seam
        want = sorted((m.x0, m.x1, m.size, m.qb, m.qe)
                      for m in collect_intv(opt, fmi, reads[i]))
        assert _key(got[i]) == want, f"read {i}"
    # flat + SA contract: device share brings fused counts, host share
    # native counts; -1 only where a fallback ran
    flat, frid, sa = collect_intv_device(
        opt, didx, arr, lens, fmi=fmi, mode="hybrid",
        return_flat=True, return_sa=True)
    assert len(flat) == len(frid) == len(sa[0])
    from tpubwa.ref.smem import sa_positions
    from tpubwa.ref.smem import BwtIntv
    off = 0
    for r in range(len(flat)):
        cnt = int(sa[0][r])
        if cnt < 0:
            continue
        iv = BwtIntv(int(flat[r, 0]), int(flat[r, 1]),
                     int(flat[r, 2]), int(flat[r, 3]),
                     int(flat[r, 4]))
        want = [p for p, _ in sa_positions(fmi, iv, opt.max_occ)]
        assert list(sa[1][off:off + cnt]) == want, f"row {r}"
        off += cnt
    assert off == len(sa[1])


def test_hybrid_small_chunk_degrades_to_host(setup, monkeypatch):
    """Below the device-share floor (k < TPUBWA_HYBRID_K_FLOOR) hybrid
    degrades to host mode: rows still equal the oracle and the flat
    contract returns sa=None (classic SA stage), NOT a crash — the
    round-2 regression (test dereferenced sa)."""
    monkeypatch.setenv("TPUBWA_HYBRID_AUTO", "0")
    monkeypatch.delenv("TPUBWA_HYBRID_K_FLOOR", raising=False)
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 131:i * 131 + 100].copy() for i in range(40)]
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)   # k = 10 < 64 -> host mode
    flat, frid, sa = collect_intv_device(
        opt, didx, arr, lens, fmi=fmi, mode="hybrid",
        return_flat=True, return_sa=True)
    assert sa is None
    assert len(flat) == len(frid)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="hybrid")
    for i in (0, 17, 40):
        want = sorted((m.x0, m.x1, m.size, m.qb, m.qe)
                      for m in collect_intv(opt, fmi, reads[i]))
        assert _key(got[i]) == want, f"read {i}"


def test_hybrid_sticky_degrade_window(setup, monkeypatch):
    """A degrade window opened by the balancer (host_until > chunks,
    set when the device share's equal-wall split falls below 0.08)
    hands the WHOLE chunk to host mode: rows equal the oracle, sa is
    None (host mode leaves SA to the classic stage), and the chunk
    counter still advances so the split is re-probed after the window
    expires — at which point the megaq share runs again (sa tuple)."""
    monkeypatch.setenv("TPUBWA_HYBRID_AUTO", "1")
    monkeypatch.setenv("TPUBWA_HYBRID_K_FLOOR", "8")
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 97:i * 97 + 100].copy() for i in range(60)]
    arr, lens = _pack_reads(reads, 100)
    st = {"f": 0.25, "chunks": 0, "host_until": 2}
    object.__setattr__(didx, "_hybrid_state", st)
    for step in range(2):   # inside the window: pure host mode
        flat, frid, sa = collect_intv_device(
            opt, didx, arr, lens, fmi=fmi, mode="hybrid",
            return_flat=True, return_sa=True)
        assert sa is None, f"device share ran inside window (step {step})"
        assert st["chunks"] == step + 1
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="hybrid")
    for i in (0, 30, 59):
        want = sorted((m.x0, m.x1, m.size, m.qb, m.qe)
                      for m in collect_intv(opt, fmi, reads[i]))
        assert _key(got[i]) == want, f"read {i}"
    # window expired: the re-probe chunk crosses the seam again
    flat, frid, sa = collect_intv_device(
        opt, didx, arr, lens, fmi=fmi, mode="hybrid",
        return_flat=True, return_sa=True)
    assert sa is not None, "re-probe after the window must use the seam"


def test_machine_mode_without_fmi_degrades_overflow_to_reach(
        setup, monkeypatch):
    """fmi=None with a machine mode must not crash on overflow lanes:
    _scalar_round1/_scalar_reseed degrade to the device reach path
    (ADVICE round-1 item 1).  Forcing a tiny stack cap drives real
    overflows through the fallback."""
    import tpubwa.device.smem_fused as sf
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    # repeat-heavy reads overflow a small stack
    reads = [np.tile(unit, 3)[:100].copy(),
             text[150:250].copy(), text[420:520].copy()]
    arr, lens = _pack_reads(reads, 100)
    monkeypatch.setenv("TPUBWA_TAIL_HOST", "64")  # host-redo branch
    got = collect_intv_device(opt, didx, arr, lens, fmi=None,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = sorted((m.x0, m.x1, m.size, m.qb, m.qe)
                      for m in collect_intv(opt, fmi, r))
        assert _key(got[i]) == want, f"read {i}"
    # direct helper coverage: fmi=None + didx -> reach rows
    from tpubwa.device.smem import _scalar_reseed, _scalar_round1
    r1 = _scalar_round1(opt, None, reads[1], 100, didx=didx)
    w1 = _scalar_round1(opt, fmi, reads[1], 100)
    assert sorted(map(tuple, r1)) == sorted(map(tuple, w1))
    r2 = _scalar_reseed(opt, None, reads[0], 100, 50, 2, didx=didx)
    w2 = _scalar_reseed(opt, fmi, reads[0], 100, 50, 2)
    assert sorted(map(tuple, r2)) == sorted(map(tuple, w2))


def test_megaq_emission_cap_retry(setup, monkeypatch):
    """Forced tiny emission buffer (CAPF) drives the global-buffer
    overflow path: flagged reads retry on the deep machine."""
    import tpubwa.device.smem_fused as sf
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    orig = sf.dispatch_chunk_machine_q

    def tiny(didx_, qd, ld, read, x0, mi, osh, P, MAXC, CAPF, CAPF2,
             *a, **k):
        return orig(didx_, qd, ld, read, x0, mi, osh, P, MAXC,
                    1 if CAPF == 5 else CAPF, CAPF2, *a, **k)
    monkeypatch.setattr(sf, "dispatch_chunk_machine_q", tiny)
    reads = [text[i * 97:i * 97 + 100].copy() for i in range(8)]
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_round_cap_retry(setup, monkeypatch):
    """A tiny backward round cap forces hung/unserved queue flags;
    flagged reads must retry (deep machine or scalar) with output
    unchanged."""
    monkeypatch.setenv("TPUBWA_RB_CAP", "6")
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 89:i * 89 + 100].copy() for i in range(6)]
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_mlx2(setup, monkeypatch):
    """TPUBWA_QB_MLX=2 (twice the machine lanes in the queue bwd
    phase) must not change output."""
    monkeypatch.setenv("TPUBWA_QB_MLX", "2")
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 97:i * 97 + 100].copy() for i in range(5)]
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_p2_small_stack(setup, monkeypatch):
    """TPUBWA_QB_P2=2 (tiny round-2 stack) overflows many reseed
    lanes into the deep retry; output must not change."""
    monkeypatch.setenv("TPUBWA_QB_P2", "2")
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    opt = MemOpt()
    reads = [text[i * 93:i * 93 + 100].copy() for i in range(5)]
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"


def test_megaq_stress_mixed_corpus(setup):
    """Randomized stress over the megaq queue machinery: mixed
    lengths, N runs, tandem repeats, garbage, and near-duplicate
    reads, all in one chunk — per-read multisets must equal the
    scalar oracle."""
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(99)
    opt = MemOpt()
    reads = []
    for t in range(40):
        L = int(rng.choice([31, 50, 70, 100]))
        start = int(rng.integers(0, len(codes) - L - 5))
        q = text[start:start + L].copy()
        kind = t % 5
        if kind == 1:      # N run
            p = int(rng.integers(0, max(L - 6, 1)))
            q[p:p + 5] = 4
        elif kind == 2:    # heavy mutations
            mut = rng.random(L) < 0.15
            q[mut] = (q[mut] + rng.integers(1, 4, int(mut.sum()))) % 4
        elif kind == 3:    # repeat-unit read
            q = np.tile(unit, (L // len(unit)) + 1)[:L].copy()
        elif kind == 4:    # garbage
            q = rng.integers(0, 5, L).astype(np.uint8)
        reads.append(q)
    arr, lens = _pack_reads(reads, 100)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i} kind {i % 5}"


@pytest.mark.parametrize("env,val", [
    ("TPUBWA_QB_BUDGET", "8"),      # tiny append budget: most rows
    #                                 drop -> tail redo path
    ("TPUBWA_STACK_P", "8"),        # shallow stack: deep lanes
    #                                 overflow -> tail redo path
])
def test_megaq_knobs_stay_oracle_equal(setup, monkeypatch, env, val):
    """Round-5 perf knobs must degrade through the overflow protocol,
    never change results: a tiny QB drops most emissions per round
    and P=8 overflows nearly every realistic lane, both landing on
    the native/scalar tail — output must equal the oracle exactly."""
    fmi, didx, codes, unit = setup
    text = fmi.bnt.doubled()
    rng = np.random.default_rng(11)
    opt = MemOpt()
    reads = []
    for t in range(8):
        start = int(rng.integers(0, len(codes) - 110))
        q = text[start:start + 100].copy()
        for _ in range(int(rng.integers(0, 6))):
            q[int(rng.integers(0, 100))] = int(rng.integers(0, 5))
        reads.append(q)
    reads.append(np.tile(unit, 3)[:100].copy())
    arr, lens = _pack_reads(reads, 100)
    monkeypatch.setenv(env, val)
    got = collect_intv_device(opt, didx, arr, lens, fmi=fmi,
                              mode="megaq")
    for i, r in enumerate(reads):
        want = collect_intv(opt, fmi, r)
        wk = sorted((m.qb, m.qe, m.size, m.x0, m.x1) for m in want)
        gk = sorted((int(x[3]), int(x[4]), int(x[2]), int(x[0]),
                     int(x[1])) for x in got[i])
        assert gk == wk, f"read {i}"
